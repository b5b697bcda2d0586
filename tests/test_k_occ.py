"""Occupied-MO exchange fast path == density-matrix exchange.

The reference builds exchange from nocc occupied orbitals when the DM is
tagged with mo_coeff/mo_occ (pyscf/pbc/df/fft_jk.py:235-259) — an
nao/nocc FFT-count saving. Contracts tested: K[occ-MO factorization] ==
K[dm] bitwise-tight at Gamma and at k, and SCF energies are unchanged
with the path enabled (it is now the default inside the FFTDF drivers).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.df import fftdf, fftdf_k
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel


def test_gamma_occ_k_parity():
    cell = diamond_primitive(mesh=(14, 14, 14))
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    nocc = system.nelec // 2
    dm = jnp.asarray(res["dm"], system.aoR.dtype)
    coulG = jnp.asarray(system.coulG)
    vk_dm = fftdf.get_k(system.aoR, dm, coulG, system.mesh, system.weight)
    C_w = res["mo_coeff"][:, :nocc] * np.sqrt(2.0)
    mo_grid = system.aoR @ jnp.asarray(C_w, system.aoR.dtype)
    vk_occ = fftdf.get_k_occ(system.aoR, mo_grid, coulG, system.mesh,
                             system.weight)
    assert np.abs(np.asarray(vk_occ) - np.asarray(vk_dm)).max() < 1e-10


def test_kpts_occ_k_parity_and_scf():
    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    nk = len(kpts)
    nocc = cell.nelectron // 2
    dmj = jnp.asarray(np.asarray(res["dm"]), system.aoR_k.dtype)
    cp = jnp.asarray(system.coulG_pairs)
    ph = jnp.asarray(system.expmikr, dtype=system.aoR_k.dtype)
    kw = system.weight / nk
    vk_dm = fftdf_k.get_k_kpts(system.aoR_k, dmj, cp, ph, system.mesh, kw)
    C_w = np.stack([np.asarray(c)[:, :nocc] * np.sqrt(2.0)
                    for c in res["mo_coeff"]])
    mo_w = jnp.einsum("kgm,kmi->kgi", system.aoR_k,
                      jnp.asarray(C_w, system.aoR_k.dtype))
    vk_occ = fftdf_k.get_k_kpts_occ(system.aoR_k, mo_w, cp, ph,
                                    system.mesh, kw)
    assert np.abs(np.asarray(vk_occ) - np.asarray(vk_dm)).max() < 1e-10
    # the driver (occ path on by default) reproduces the golden-path energy
    res2 = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10,
                       df="fftdf")
    assert res2["e_tot"] == pytest.approx(res["e_tot"], abs=1e-9)
