"""Staggered-mesh KMP2 against the reference's embedded golden values.

Anchors: pyscf/pbc/mp/kmp2_stagger.py __main__ (H2 in a 6 Bohr cube,
gth-szv / gth-pade, ke_cutoff=100, 2x2x2 Gamma-centered mesh, FFTDF):
  standard KMP2           = -0.0143904878990777
  stagger, flag_submesh   = -0.0160902544091997
  stagger, non-SCF bands  = -0.0140289970302513
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.mp.kmp2 import kmp2_energy
from pyscf_isdf_tpu.mp.kmp2_stagger import kmp2_stagger_energy


@pytest.fixture(scope="module")
def h2_222():
    a = 6.0 * np.eye(3)
    cell = build_cell(a, [["H", (3.0, 3.0, 2.10)],
                          ["H", (3.0, 3.0, 3.90)]],
                      basis="gth-szv", pseudo="gth-pade", ke_cutoff=100.0)
    kpts = lattice.make_kpts(cell.a, [2, 2, 2], with_gamma_point=True)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    return system, res


def test_standard_kmp2_golden(h2_222):
    system, res = h2_222
    emp2 = kmp2_energy(system, res)
    assert emp2 == pytest.approx(-0.0143904878990777, abs=2e-6)


def test_stagger_submesh_golden(h2_222):
    system, res = h2_222
    emp2 = kmp2_stagger_energy(system, res, flag_submesh=True)
    assert emp2 == pytest.approx(-0.0160902544091997, abs=2e-6)


def test_stagger_nonscf_golden(h2_222):
    system, res = h2_222
    emp2 = kmp2_stagger_energy(system, res, flag_submesh=False)
    assert emp2 == pytest.approx(-0.0140289970302513, abs=2e-6)
