"""Low-dimensional (2D truncated-Coulomb) systems.

Goldens:
  * 2D Ewald He2: -5.1194779101355596 (pyscf/pbc/gto/test/test_cell.py:214-224)
  * 2D Ewald mixed H2He: -3.0902098018260418 (test_cell.py:226-230)
  * 2D RKS H2 slab: -0.6252695697315944 (pyscf/pbc/dft/test/test_rks.py:121-141)
"""
import dataclasses
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel


def test_ewald_2d_golden():
    cell = build_cell(np.eye(3) * 4, "He 0 0 0; He 0 1 1",
                      basis=[[0, (1.0, 1.0)]], mesh=[9, 9, 60], dimension=2)
    cell = dataclasses.replace(cell, rcut=3.6)
    assert coulomb.ewald(cell) == pytest.approx(-5.1194779101355596, abs=1e-9)


def test_ewald_2d_mixed_golden():
    a = np.eye(3) * 3
    a[0, 1] = 0.2
    cell = build_cell(a, "H 0 0.1 0; H 1.1 2.0 0; He 1.2 .3 0.2",
                      basis=[[0, (1.0, 1.0)]], mesh=[15] * 3, dimension=2,
                      unit="Angstrom")
    assert coulomb.ewald(cell) == pytest.approx(-3.0902098018260418, abs=1e-9)


def test_rks_2d_slab_golden():
    a = np.eye(3) * 4.0
    a[2, 2] = 12.0
    cell = build_cell(a, "H 0 0 0; H .8 .8 0",
                      basis=[[0, (4.0, 1.0)], [0, (1.0, 1.0)]], dimension=2)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-0.6252695697315944, abs=1e-7)


def test_0d_isolated_molecule():
    """dim=0: spherically truncated Coulomb gives box-size-independent
    isolated-atom energies (the periodic treatment drifts with L)."""
    basis = [[0, (3.0, 1.0)], [0, (0.8, 1.0)], [0, (0.25, 1.0)]]
    es = {}
    for L, n in [(12.0, 40), (16.0, 54)]:
        cell = build_cell(np.eye(3) * L, [["He", (L / 2, L / 2, L / 2)]],
                          basis=basis, mesh=[n] * 3, dimension=0)
        r = scf_kernel(build_scf_system(cell), xc=None, exxdiv=None,
                       conv_tol=1e-10)
        assert r["converged"]
        es[L] = r["e_tot"]
    assert abs(es[12.0] - es[16.0]) < 1e-4
    assert -2.9 < es[12.0] < -2.6  # physical He RHF range for this basis


def test_ewald_1d_exact_pair():
    """1D (cylindrically truncated, Rozzi PRB 73, 205119) Ewald matches the
    exact regularized lattice sum for a neutral +1/-1 pair to 1e-12.
    Exceeds the reference, whose 1D branch is unreachable
    (pyscf/pbc/tools/pbc.py:371-374 raises)."""
    d, L, Lt = 2.0, 20.0, 12.0
    a = np.diag([L, Lt, Lt])
    cell = build_cell(a, [["H", (1.0, Lt / 2, Lt / 2)],
                          ["H", (1.0 + d, Lt / 2, Lt / 2)]],
                      basis=[[0, (1.0, 1.0)]], mesh=[8, 8, 8], dimension=1)
    cell = dataclasses.replace(cell, charges=np.array([1.0, -1.0]))
    e = coulomb.ewald(cell)
    n = np.arange(1, 2000000)
    ex = -1.0 / d + np.sum(2.0 / (n * L) - 1.0 / (n * L + d)
                           - 1.0 / (n * L - d))
    assert e == pytest.approx(ex, abs=1e-11)


def test_1d_wire_isolated_limit():
    """A widely separated 1D chain reproduces the isolated-atom (0D)
    energy and is independent of the transverse box."""
    basis = [[0, (3.0, 1.0)], [0, (0.8, 1.0)], [0, (0.25, 1.0)]]
    es = {}
    for Lt, n in [(12.0, 40), (16.0, 54)]:
        a = np.diag([14.0, Lt, Lt])
        cell = build_cell(a, [["He", (7.0, Lt / 2, Lt / 2)]], basis=basis,
                          mesh=[48, n, n], dimension=1)
        r = scf_kernel(build_scf_system(cell), xc=None, exxdiv="ewald",
                       conv_tol=1e-10)
        assert r["converged"]
        es[Lt] = r["e_tot"]
    assert abs(es[12.0] - es[16.0]) < 1e-4
    cell0 = build_cell(np.eye(3) * 14.0, [["He", (7.0, 7.0, 7.0)]],
                      basis=basis, mesh=[48] * 3, dimension=0)
    r0 = scf_kernel(build_scf_system(cell0), xc=None, exxdiv=None,
                    conv_tol=1e-10)
    assert abs(es[16.0] - r0["e_tot"]) < 1e-4
