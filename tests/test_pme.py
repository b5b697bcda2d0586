"""Particle-mesh Ewald == exact structure-factor Ewald.

Reference: pyscf/pbc/gto/ewald_methods.py:123 (B-spline smooth PME).
The exact Ewald sum (ops/coulomb.ewald, golden-tested in
test_foundation) is the oracle; PME must agree to ~cell.precision on a
symmetric and on a low-symmetry mixed-charge cell.
"""
import numpy as np

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.pme import particle_mesh_ewald


def test_pme_diamond():
    cell = diamond_primitive(mesh=(14, 14, 14))
    e0 = coulomb.ewald(cell)
    e1 = particle_mesh_ewald(cell)
    assert abs(e1 - e0) < 1e-7


def test_pme_low_symmetry_mixed_charges():
    a = np.array([[6.1, 0.3, 0.0], [0.0, 5.7, 0.4], [0.2, 0.0, 6.6]])
    cell = build_cell(a, [["Li", (1.1, 2.0, 3.0)], ["H", (4.0, 1.5, 2.2)],
                          ["He", (2.5, 4.4, 5.0)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[16] * 3)
    e0 = coulomb.ewald(cell)
    e1 = particle_mesh_ewald(cell)
    assert abs(e1 - e0) < 1e-7
    # interpolation-order convergence: order 6 is coarser than order 10
    e6 = particle_mesh_ewald(cell, order=6)
    assert abs(e6 - e0) < 1e-4
    assert abs(e1 - e0) <= abs(e6 - e0) + 1e-12
