"""Gamma-point restricted MP2 on the FFT grid.

Energy contract per the reference k-point kernel at a single Gamma point
(pyscf/pbc/mp/kmp2.py:45-155): ERIs from the FFT-grid transform, SCF
orbital energies as-is (the ewald exxdiv shift of occupied levels included,
as the reference does), and

    E2 = sum_iajb (ia|jb) [2 (ia|jb) - (ib|ja)] / (ei + ej - ea - eb).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fft_ao2mo


def mp2_energy(system, scf_res, nocc=None) -> float:
    """MP2 correlation energy from a converged Gamma-point RHF result."""
    mo_e = np.asarray(scf_res["mo_energy"])
    mo_c = np.asarray(scf_res["mo_coeff"])
    if nocc is None:
        nocc = system.nelec // 2
    nmo = mo_c.shape[1]
    nvir = nmo - nocc

    aoR = system.aoR
    moR = aoR @ jnp.asarray(mo_c, aoR.dtype)
    moR_o, moR_v = moR[:, :nocc], moR[:, nocc:]
    coulG = jnp.asarray(system.coulG)

    ovov = np.asarray(
        fft_ao2mo.general(moR_o, moR_v, moR_o, moR_v, coulG, system.mesh,
                          system.weight)
    ).reshape(nocc, nvir, nocc, nvir)

    e_o, e_v = mo_e[:nocc], mo_e[nocc:]
    denom = (e_o[:, None, None, None] + e_o[None, None, :, None]
             - e_v[None, :, None, None] - e_v[None, None, None, :])
    t2 = ovov / denom
    return float(np.einsum("iajb,iajb->", t2, 2 * ovov)
                 - np.einsum("iajb,ibja->", t2, ovov))
