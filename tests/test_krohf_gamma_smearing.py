"""KROHF (k-point restricted open shell) and Gamma-point smearing.

Reference contracts: pyscf/pbc/scf/krohf.py:383 (Roothaan Fock at k) and
pyscf/pbc/scf/addons.py:216 (smearing applies to all SCF classes).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.scf.krohf import krohf_kernel
from pyscf_isdf_tpu.scf.rohf import rohf_kernel


def _li_cell(mesh=(18, 18, 18)):
    """Spin-1/2 open-shell cell: one Li atom in a cubic box."""
    L = 6.0
    return build_cell(L * np.eye(3), [["Li", (L / 2, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade-q3", mesh=mesh,
                      spin=1)


def test_krohf_closed_shell_equals_krhf():
    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    ref = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    res = krohf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_krohf_single_k_equals_gamma_rohf():
    cell = _li_cell()
    gsys = build_scf_system(cell)
    ref = rohf_kernel(gsys, xc=None, exxdiv="ewald", conv_tol=1e-10)
    ksys = build_kscf_system(cell, np.zeros((1, 3)))
    res = krohf_kernel(ksys, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)
    # spin bookkeeping: one singly-occupied orbital
    assert sum(float((o == 1).sum()) for o in res["mo_occ"]) == 1


def test_krohf_isdf_engine():
    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    ref = krohf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    res = krohf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10,
                       df="isdf", isdf_c=10)
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-7)


def test_gamma_smearing_matches_single_k():
    """scf_kernel(sigma) == kscf_kernel(sigma) at one Gamma k-point
    (entropy, mu, free energy, total energy)."""
    cell = diamond_primitive(mesh=(15, 15, 15))
    gsys = build_scf_system(cell)
    res_g = scf_kernel(gsys, xc="lda,vwn", conv_tol=1e-10, sigma=0.1)
    ksys = build_kscf_system(cell, np.zeros((1, 3)))
    res_k = kscf_kernel(ksys, xc="lda,vwn", conv_tol=1e-10, sigma=0.1)
    assert res_g["converged"]
    assert res_g["e_tot"] == pytest.approx(res_k["e_tot"], abs=1e-8)
    assert res_g["entropy"] == pytest.approx(res_k["entropy"], abs=1e-8)
    assert res_g["mu"] == pytest.approx(res_k["mu"], abs=1e-7)
    assert res_g["e_free"] == pytest.approx(res_k["e_free"], abs=1e-8)
    # fractional occupations actually happened at this sigma
    assert np.any((res_g["mo_occ"] > 1e-6) & (res_g["mo_occ"] < 2 - 1e-6))


def test_gamma_smearing_zero_limit():
    """sigma -> 0 recovers the integer-occupation result."""
    cell = diamond_primitive(mesh=(15, 15, 15))
    gsys = build_scf_system(cell)
    ref = scf_kernel(gsys, xc="lda,vwn", conv_tol=1e-10)
    res = scf_kernel(gsys, xc="lda,vwn", conv_tol=1e-10, sigma=1e-4)
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-7)
    assert abs(res["entropy"]) < 1e-6


def test_frontend_gamma_smearing():
    import pyscf_isdf_tpu as pit

    cell = diamond_primitive(mesh=(15, 15, 15))
    mf = pit.RKS(cell, xc="lda,vwn").smearing(0.1)
    e = mf.kernel()
    assert mf.converged
    assert np.isfinite(mf.entropy) and mf.entropy > 0
    assert mf.e_free <= e + 1e-12
