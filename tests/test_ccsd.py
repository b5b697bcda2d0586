"""Gamma-point spin-orbital CCSD / CCSD(T) vs the exact FCI oracle.

The reference's coupled-cluster family (pyscf/pbc/cc, pyscf/cc/gccsd.py)
is validated here from first principles: for a 2-electron cell CCSD is
exact (== FCI to machine precision, and E(T) vanishes identically); for
a 4-electron cell CCSD is near FCI and (T) tightens the residual.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.cc import ccsd, fci_ground_state
from pyscf_isdf_tpu.cc import gccsd
from pyscf_isdf_tpu.df import fft_ao2mo


def _fci_total(system, res):
    mo_c = np.asarray(res["mo_coeff"])
    nmo = mo_c.shape[1]
    h1mo = mo_c.T @ system.hcore @ mo_c
    moR = system.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(system.coulG), system.mesh,
        system.weight)).reshape(nmo, nmo, nmo, nmo)
    h1so, eri_so = gccsd.spinorb_from_spatial(h1mo, eri_mo)
    (e_fci,), _ = fci_ground_state(h1so, eri_so, system.nelec)
    return e_fci + system.e_nuc


@pytest.fixture(scope="module")
def be_2e():
    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2, L / 2, L / 2)]], basis="gth-szv",
                      pseudo="gth-pade-q2", mesh=[12] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    return system, res


@pytest.fixture(scope="module")
def h4():
    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    return system, res


def test_ccsd_equals_fci_two_electrons(be_2e):
    """2-electron CCSD is exact: == FCI to machine precision."""
    system, res = be_2e
    out = ccsd(system, res, with_t=True, conv_tol=1e-12)
    assert out["converged"]
    e_fci = _fci_total(system, res)
    assert abs(res["e_tot"] + out["e_corr"] - e_fci) < 1e-12
    # no triples exist with 2 electrons
    assert out["e_t"] == 0.0


def test_first_iteration_is_mp2(be_2e):
    """The t=initial CC energy equals MP2 (same Hamiltonian)."""
    from pyscf_isdf_tpu.mp import mp2_energy
    system, res = be_2e
    mo_e = np.asarray(res["mo_energy"])
    mo_c = np.asarray(res["mo_coeff"])
    nmo = mo_c.shape[1]
    moR = system.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(system.coulG), system.mesh,
        system.weight)).reshape(nmo, nmo, nmo, nmo)
    _, eri_so = gccsd.spinorb_from_spatial(np.diag(mo_e), eri_mo)
    f_so = np.diag(np.repeat(mo_e, 2))
    no = system.nelec
    e = np.repeat(mo_e, 2)
    D2 = (e[:no, None, None, None] + e[None, :no, None, None]
          - e[None, None, no:, None] - e[None, None, None, no:])
    t2_0 = eri_so[no:, no:, :no, :no].transpose(2, 3, 0, 1) / D2
    t1_0 = np.zeros((no, eri_so.shape[0] - no))
    e_mp2_so = float(gccsd.energy(jnp.asarray(t1_0), jnp.asarray(t2_0),
                                  jnp.asarray(f_so), jnp.asarray(eri_so),
                                  no))
    assert abs(e_mp2_so - mp2_energy(system, res)) < 1e-10


def test_ccsd_t_tightens_toward_fci(h4):
    """4-electron H4: CCSD near FCI, (T) reduces the residual."""
    system, res = h4
    out = ccsd(system, res, with_t=True, conv_tol=1e-11)
    assert out["converged"]
    e_fci = _fci_total(system, res)
    d_ccsd = res["e_tot"] + out["e_corr"] - e_fci
    d_ccsdt = d_ccsd + out["e_t"]
    assert abs(d_ccsd) < 5e-5
    assert abs(d_ccsdt) < abs(d_ccsd)
    # correlation is real and negative
    assert out["e_corr"] < -0.01


def test_thc_ccsd_matches_exact(h4):
    """THC-CCSD: ISDF-factorized MO ERIs feed the CCSD kernel; at
    sufficient rank the correlation energy matches the exact-integral
    CCSD (the ISDF fit error is the only difference)."""
    from pyscf_isdf_tpu.df import isdf as isdf_mod

    system, res = h4
    exact = ccsd(system, res, conv_tol=1e-11)
    isdf = isdf_mod.build_isdf(system.aoR, jnp.asarray(system.coulG),
                               system.mesh, system.weight, c=20)
    thc = ccsd(system, res, conv_tol=1e-11, isdf=isdf)
    assert thc["converged"]
    assert abs(thc["e_corr"] - exact["e_corr"]) < 1e-6
