"""EOM-CCSD (EE/IP/EA) vs exact FCI.

For 2-electron systems the EE projection space (0+S+D) and the IP space
(1h+2h1p) are COMPLETE, so every EOM root must equal FCI exactly — this
pins the whole determinant-space similarity transform including the
t1/t2 operator conventions. The lowest EE root must equal the CCSD
ground-state energy for ANY system (Hbar block structure at
convergence).
"""
import numpy as np
import jax.numpy as jnp
import pytest
from itertools import combinations

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.cc import ccsd
from pyscf_isdf_tpu.cc.gccsd import spinorb_from_spatial
from pyscf_isdf_tpu.cc.fci import build_hamiltonian
from pyscf_isdf_tpu.cc.eom import eom_ccsd, eom_from_scf
from pyscf_isdf_tpu.df import fft_ao2mo


def _so_integrals(system, res):
    mo_c = np.asarray(res["mo_coeff"])
    nmo = mo_c.shape[1]
    h1mo = mo_c.T @ system.hcore @ mo_c
    moR = system.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(system.coulG), system.mesh,
        system.weight)).reshape(nmo, nmo, nmo, nmo)
    return spinorb_from_spatial(h1mo, eri_mo)


@pytest.fixture(scope="module")
def be_case():
    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2, L / 2, L / 2)]], basis="gth-szv",
                      pseudo="gth-pade-q2", mesh=[12] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    out = ccsd(system, res, conv_tol=1e-12)
    return system, res, out


def test_ee_equals_fci_two_electrons(be_case):
    system, res, out = be_case
    h1so, eri_so = _so_integrals(system, res)
    no = system.nelec
    nso = h1so.shape[0]
    dets = list(combinations(range(nso), no))
    w_fci = np.sort(np.linalg.eigvalsh(
        build_hamiltonian(h1so, eri_so, dets)))
    w_ee = eom_ccsd(h1so, eri_so, np.asarray(out["t1"]),
                    np.asarray(out["t2"]), no, sector="ee",
                    nroots=len(dets))
    assert np.abs(np.sort(w_ee) - w_fci).max() < 1e-9
    # lowest root is the CCSD ground state
    e_elec_cc = res["e_tot"] - system.e_nuc + out["e_corr"]
    assert abs(np.min(w_ee) - e_elec_cc) < 1e-9


def test_ip_equals_fci_two_electrons(be_case):
    system, res, out = be_case
    h1so, eri_so = _so_integrals(system, res)
    no = system.nelec
    nso = h1so.shape[0]
    dets1 = [(p,) for p in range(nso)]
    w1 = np.sort(np.linalg.eigvalsh(
        build_hamiltonian(h1so, eri_so, dets1)))
    w_ip = eom_ccsd(h1so, eri_so, np.asarray(out["t1"]),
                    np.asarray(out["t2"]), no, sector="ip",
                    nroots=len(dets1))
    assert np.abs(np.sort(w_ip) - w1).max() < 1e-9
    ips = eom_from_scf(system, res, out, sector="ip", nroots=2)
    # standard convention: IP_0 = E_0(N-1) - E_0(N)
    e_gs = eom_ccsd(h1so, eri_so, np.asarray(out["t1"]),
                    np.asarray(out["t2"]), no, sector="ee", nroots=1)[0]
    assert abs(ips[0] - (np.sort(w_ip)[0] - e_gs)) < 1e-9


def test_h4_ground_state_and_excitations():
    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    out = ccsd(system, res, conv_tol=1e-12)
    h1so, eri_so = _so_integrals(system, res)
    no = system.nelec
    w_ee = eom_ccsd(h1so, eri_so, np.asarray(out["t1"]),
                    np.asarray(out["t2"]), no, sector="ee", nroots=6)
    e_elec_cc = res["e_tot"] - system.e_nuc + out["e_corr"]
    assert abs(np.min(w_ee) - e_elec_cc) < 1e-8
    # first excitation vs FCI (EOM-CCSD truncation error: a few mHa)
    from pyscf_isdf_tpu.cc.fci import fci_ground_state
    (e0, e1), _ = fci_ground_state(h1so, eri_so, no, nroots=2)
    de_fci = e1 - e0
    de_eom = np.sort(w_ee)[1] - np.min(w_ee)
    assert abs(de_eom - de_fci) < 5e-3
    assert de_eom > 0.1          # physically sizable gap


def test_ccsd_rdm1_equals_fci_two_electrons(be_case):
    """The Lambda-response CCSD 1-RDM == FCI density exactly for 2e
    (complete projection space), and satisfies the trace/hermiticity
    sum rules."""
    from pyscf_isdf_tpu.cc.density import ccsd_rdm1, fci_rdm1

    system, res, out = be_case
    h1so, eri_so = _so_integrals(system, res)
    no = system.nelec
    g_cc = ccsd_rdm1(h1so, eri_so, np.asarray(out["t1"]),
                     np.asarray(out["t2"]), no)
    g_fci = fci_rdm1(h1so, eri_so, no)
    assert abs(np.trace(g_cc) - no) < 1e-9
    assert np.abs(g_cc - g_cc.T).max() < 1e-8
    assert np.abs(g_cc - g_fci).max() < 1e-8
    # energy from the density + FCI 2-RDM consistency is implied;
    # natural occupations physical
    occs = np.linalg.eigvalsh(g_cc)
    assert occs.min() > -1e-9 and occs.max() < 1 + 1e-9


def test_jacobian_eom_matches_determinant():
    """Production-cost EOM-EE (= the CCSD residual Jacobian via one
    jax.jvp through the jitted amplitude update) reproduces the exact
    determinant-space EOM excitation energies."""
    from pyscf_isdf_tpu.cc.eom import eom_ee_energies

    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    out = ccsd(system, res, conv_tol=1e-12)
    h1so, eri_so = _so_integrals(system, res)
    no = system.nelec
    f_so = np.diag(np.repeat(np.asarray(res["mo_energy"]), 2))

    w_det = eom_ccsd(h1so, eri_so, np.asarray(out["t1"]),
                     np.asarray(out["t2"]), no, sector="ee", nroots=8)
    de_det = np.sort(w_det)[1:] - np.min(w_det)
    w_jac = eom_ee_energies(f_so, eri_so, out["t1"], out["t2"], no,
                            nroots=8)
    assert np.abs(np.sort(w_jac)[:5] - de_det[:5]).max() < 1e-9


def test_iterative_eom_matches_dense():
    """Matrix-free Arnoldi on the jitted Jacobian sigma == dense."""
    from pyscf_isdf_tpu.cc.eom import eom_ee_energies, eom_ee_iterative

    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    out = ccsd(system, res, conv_tol=1e-12)
    h1so, eri_so = _so_integrals(system, res)
    f_so = np.diag(np.repeat(np.asarray(res["mo_energy"]), 2))
    no = system.nelec
    dense = eom_ee_energies(f_so, eri_so, out["t1"], out["t2"], no,
                            nroots=6)
    iterv = eom_ee_iterative(f_so, eri_so, out["t1"], out["t2"], no,
                             nroots=6)
    assert np.abs(dense[:len(iterv)] - iterv).max() < 1e-9


def test_eomccsd_frontend_smoke():
    import pyscf_isdf_tpu as pit

    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2, L / 2, L / 2)]], basis="gth-szv",
                      pseudo="gth-pade-q2", mesh=[12] * 3)
    mf = pit.RHF(cell, exxdiv=None)
    mf.run()
    ee = pit.EOMCCSD(mf, sector="ee", nroots=3)
    ips = pit.EOMCCSD(mf, sector="ip", nroots=2)
    assert np.all(ee > 1e-6)     # trivial root dropped; real excitations
    assert len(ips) == 2


def test_iterative_eom_shift_invert_interior():
    """Shift-invert targeting reaches INTERIOR roots the plain
    which='SR' Arnoldi is not guaranteed to find (weak #6 caveat)."""
    from pyscf_isdf_tpu.cc.eom import eom_ee_energies, eom_ee_iterative

    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    out = ccsd(system, res, conv_tol=1e-12)
    h1so, eri_so = _so_integrals(system, res)
    f_so = np.diag(np.repeat(np.asarray(res["mo_energy"]), 2))
    no = system.nelec
    dense = eom_ee_energies(f_so, eri_so, out["t1"], out["t2"], no,
                            nroots=10)
    # aim just below the 7th root — interior territory (NOT the exact
    # midpoint: this spectrum's multiplet spacing puts a genuine
    # eigenvalue at (dense[5]+dense[6])/2, where the shifted system is
    # singular and the inner-solve guard correctly raises)
    tgt = dense[6] - 0.013
    got = eom_ee_iterative(f_so, eri_so, out["t1"], out["t2"], no,
                           nroots=2, target=tgt)
    near = np.abs(dense[None, :] - got[:, None]).min(axis=1)
    assert near.max() < 1e-8


def test_ip_ea_production_matches_oracle(be_case):
    """The continuum-orbital IP/EA (polynomial-cost jvp subblock,
    cc/eom.py eom_ip_ea_energies) equals the determinant-space oracle
    in both sectors — for 2 electrons the IP projection space is
    complete, so this also pins them to FCI."""
    from pyscf_isdf_tpu.cc.eom import eom_ip_ea_energies

    system, res, out = be_case
    h1so, eri_so = _so_integrals(system, res)
    no = system.nelec
    f = h1so + np.einsum("piqi->pq", eri_so[:, :no, :, :no])
    t1, t2 = np.asarray(out["t1"]), np.asarray(out["t2"])
    for sector in ("ip", "ea"):
        w_oracle = eom_from_scf(system, res, out, sector=sector, nroots=4)
        w_prod = eom_ip_ea_energies(f, eri_so, t1, t2, no,
                                    sector=sector, nroots=4)
        assert np.abs(w_prod - w_oracle).max() < 1e-9, sector
