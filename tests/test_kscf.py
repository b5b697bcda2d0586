"""k-point sampled SCF parity (KRHF/KRKS) against reference golden values.

Anchors:
  * H2 klda 2x2x1: -0.3846075202893169 (pyscf/pbc/dft/test/test_krks.py:88)
  * diamond primitive KRKS lda 2x2x2 (no Gamma): -11.353643583707452
    (test_krks.py:129)
  * He2 KRHF random k, vcut_sph: -4.1379172088570595
    (pyscf/pbc/scf/test/test_hf.py:85-88)
  * KRHF at single Gamma == RHF ewald: -4.3511582284698633 (test_hf.py:97)
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel


def _he2_cell():
    L = 4.0
    return build_cell(
        ((L, 0, 0), (0, L, 0), (0, 0, L)),
        [["He", (L / 2.0 - 0.5, L / 2.0, L / 2.0 - 0.5)],
         ["He", (L / 2.0, L / 2.0, L / 2.0 + 0.5)]],
        basis=[[0, (0.8, 1.0)], [0, (1.0, 1.0)], [0, (1.2, 1.0)]],
        mesh=[21] * 3,
    )


def test_krhf_random_kpt_vcut_sph():
    cell = _he2_cell()
    np.random.seed(1)
    k = np.random.random(3)
    system = build_kscf_system(cell, k.reshape(1, 3))
    res = kscf_kernel(system, xc=None, exxdiv="vcut_sph", conv_tol=1e-11)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-4.1379172088570595, abs=1e-7)


def test_krhf_gamma_matches_rhf():
    cell = _he2_cell()
    system = build_kscf_system(cell, np.zeros((1, 3)))
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-4.3511582284698633, abs=1e-7)


def test_klda_h2_221():
    cell = build_cell(
        np.eye(3) * 2, [["H", (0, 0, 0)], ["H", (1, 0, 0)]],
        basis=[[0, (1.0, 1.0)]], unit="Angstrom",
    )
    kpts = lattice.make_kpts(cell.a, [2, 2, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-0.3846075202893169, abs=1e-6)


@pytest.mark.slow
def test_klda_diamond_222():
    cell = diamond_primitive(mesh=(17, 17, 17))
    kpts = lattice.make_kpts(cell.a, [2, 2, 2], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-11.353643583707452, abs=1e-7)


def test_krhf_311_vcut_sph_golden():
    """Multi-k exchange: KRHF diamond 3x1x1 with vcut_sph
    (pyscf/pbc/scf/test/test_khf.py:52-56,132: -11.218735269838586)."""
    cell = diamond_primitive(mesh=(9, 9, 9))
    kpts = lattice.make_kpts(cell.a, [3, 1, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="vcut_sph", conv_tol=1e-9)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-11.218735269838586, abs=1e-7)
