"""Si all-electron high-cutoff tail of the uniform-mesh convergence study
(phase 2 of tools/becke_study.py — the deep 1s core needs ke ~ 8 a_max)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel

ANG2BOHR = 1.0 / 0.529177210903

a = np.array([[0.0, 2.715, 2.715],
              [2.715, 0.0, 2.715],
              [2.715, 2.715, 0.0]]) * ANG2BOHR
atoms = [("Si", np.zeros(3)), ("Si", (a[0] + a[1] + a[2]) / 4.0)]

dm = None
for ke in [1600, 2000, 2400, 2800, 3200]:
    cell = build_cell(a, atoms, basis="sto-3g", pseudo=None,
                      ke_cutoff=float(ke), unit="Bohr")
    t0 = time.time()
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", max_cycle=100, conv_tol=1e-10)
    print("ke=%6.0f  mesh=%-15s ngrids=%8d  E=%.9f  conv=%s  %.0fs"
          % (ke, cell.mesh, np.prod(cell.mesh), res["e_tot"],
             res["converged"], time.time() - t0), flush=True)
