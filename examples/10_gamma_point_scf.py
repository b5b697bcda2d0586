#!/usr/bin/env python
"""Gamma-point SCF on the diamond primitive cell (RHF / RKS).

The canonical entry workflow (reference analog:
examples/pbc/10-gamma_point_scf.py): build a Cell, build the SCF system,
run the kernel.
"""
import jax

jax.config.update("jax_enable_x64", True)  # float64 parity mode (CPU host)

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel

cell = build_cell(
    a=[[0.0, 1.7834, 1.7834], [1.7834, 0.0, 1.7834], [1.7834, 1.7834, 0.0]],
    atom="C 0 0 0; C 0.8917 0.8917 0.8917",
    basis="gth-szv",
    pseudo="gth-pade",
    mesh=(17, 17, 17),
    unit="Angstrom",
)
system = build_scf_system(cell)

res = scf_kernel(system, xc="lda,vwn", verbose=True)
print("RKS (LDA)   E =", res["e_tot"])

res = scf_kernel(system, xc=None, exxdiv="ewald", verbose=True)
print("RHF (ewald) E =", res["e_tot"])
