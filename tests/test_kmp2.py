"""k-point MP2 parity against the reference golden values.

Anchors (pyscf/pbc/mp/test/test_kpoint.py:85-97, Be triclinic cell,
gth-szv / gth-pade-q2, mesh [12]^3, wrap_around k-mesh):
  3x1x1:  escf = -1.0585001200928885,  emp2 = -7.9832274354253814e-06
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.mp.kmp2 import kmp2_energy


def test_kmp2_311_golden():
    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2.0, L / 2.0, L / 2.0)]],
                      basis="gth-szv", pseudo="gth-pade-q2", mesh=[12] * 3)
    kpts = lattice.make_kpts(cell.a, [3, 1, 1], wrap_around=True)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-12)
    assert res["e_tot"] == pytest.approx(-1.0585001200928885, abs=1e-7)
    emp = kmp2_energy(system, res)
    assert emp == pytest.approx(-7.9832274354253814e-06, abs=1e-9)
