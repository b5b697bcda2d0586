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


def test_thc_kmp2_matches_exact():
    """k-point THC-MP2 (ISDF factors + phased W kernels) == exact KMP2."""
    from pyscf_isdf_tpu.models import diamond_primitive
    from pyscf_isdf_tpu.mp.thc import thc_kmp2_energy
    from pyscf_isdf_tpu.df import isdf_k

    cell = diamond_primitive(mesh=(15, 15, 15))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    e_exact = kmp2_energy(system, res)
    isdfk = isdf_k.build_isdf_k(cell, system.aoR_k, kpts, c=10, keep_xi=True)
    e_thc = thc_kmp2_energy(system, res, isdfk)
    assert e_thc == pytest.approx(e_exact, abs=1e-8)
