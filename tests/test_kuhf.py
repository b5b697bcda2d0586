"""k-point spin-polarized SCF (KUHF/KUKS) parity.

Anchors: H2 2x2x1 KUKS lda == -0.3846075202893169
(pyscf/pbc/dft/test/test_kuks.py:41-46); KUHF closed-shell == KRHF.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel


@pytest.fixture(scope="module")
def h2_system():
    cell = build_cell(
        np.eye(3) * 2, [["H", (0, 0, 0)], ["H", (1, 0, 0)]],
        basis=[[0, (1.0, 1.0)]], unit="Angstrom",
    )
    kpts = lattice.make_kpts(cell.a, [2, 2, 1])
    return build_kscf_system(cell, kpts)


def test_kuks_h2_golden(h2_system):
    res = kuhf_kernel(h2_system, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-0.3846075202893169, abs=1e-6)


def test_kuhf_matches_krhf(h2_system):
    res_u = kuhf_kernel(h2_system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    res_r = kscf_kernel(h2_system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert res_u["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-8)


def test_kuks_pbe_matches_krks():
    """k-point spin GGA (KUKS/PBE) == KRKS/PBE for closed shells."""
    from pyscf_isdf_tpu.models import diamond_primitive

    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    system = build_kscf_system(cell, kpts)
    r = kscf_kernel(system, xc="pbe", conv_tol=1e-9)
    u = kuhf_kernel(system, xc="pbe", conv_tol=1e-9)
    assert u["converged"]
    assert u["e_tot"] == pytest.approx(r["e_tot"], abs=1e-8)
