"""Autodiff nuclear gradients vs central finite differences.

The forces module (grad/rhf.py) replaces the reference's analytic
gradient kernels (pyscf/pbc/df/fft_jk.py:111,304; pyscf/grad) with one
jax.grad through the position-traced energy functional (Hellmann-
Feynman + Pulay at the SCF stationary point). The oracle is central
finite differences of independently converged SCF total energies.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.grad.rhf import rhf_gradient


def _h2_cell(dx=0.0):
    L = 6.0
    return build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 0.8 + dx, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2 + 0.1, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)


def _converge(cell, xc):
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=xc, exxdiv="ewald", conv_tol=1e-13)
    assert res["converged"]
    return system, res


@pytest.mark.parametrize("xc", [None, "pbe0", "b3lyp", "hse06"])
def test_h2_gradient_vs_fd(xc):
    system, res = _converge(_h2_cell(), xc)
    g, e_chk = rhf_gradient(system, res, xc=xc, return_energy=True)
    # the traced functional reproduces the converged SCF energy exactly
    assert abs(e_chk - res["e_tot"]) < 1e-10
    h = 2e-4
    _, rp = _converge(_h2_cell(+h), xc)
    _, rm = _converge(_h2_cell(-h), xc)
    fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
    assert abs(g[0, 0] - fd) < 5e-7


def test_energy_parity_lda_pbe():
    system, res = _converge(_h2_cell(), "lda,vwn")
    _, e_chk = rhf_gradient(system, res, xc="lda,vwn", return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-10
    system, res = _converge(_h2_cell(), "pbe")
    _, e_chk = rhf_gradient(system, res, xc="pbe", return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-10


def test_uhf_gradient_vs_fd():
    """Spin-polarized forces (H3 radical, UKS-LDA) vs FD."""
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel
    from pyscf_isdf_tpu.grad.uhf import uhf_gradient

    def setup(dx):
        L = 7.0
        cell = build_cell(np.eye(3) * L,
                          [["H", (L / 2 - 1.0 + dx, L / 2, L / 2)],
                           ["H", (L / 2 + 0.4, L / 2 + 0.1, L / 2)],
                           ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                          basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3,
                          spin=1)
        system = build_scf_system(cell)
        res = uhf_kernel(system, xc="lda,vwn", exxdiv="ewald",
                         conv_tol=1e-13)
        assert res["converged"]
        return system, res

    system, res = setup(0.0)
    g, e_chk = uhf_gradient(system, res, xc="lda,vwn", return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-10
    h = 2e-4
    _, rp = setup(+h)
    _, rm = setup(-h)
    fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
    assert abs(g[0, 0] - fd) < 5e-7


@pytest.mark.slow
def test_h2_relaxation():
    """FIRE geometry optimization on autodiff forces: a stretched H2
    relaxes to its szv equilibrium bond length."""
    from pyscf_isdf_tpu.grad.optimize import optimize
    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.1, L / 2, L / 2)],
                       ["H", (L / 2 + 1.1, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[15] * 3)
    cell_opt, info = optimize(cell, xc=None, fmax=3e-3, maxsteps=40)
    assert info["converged"]
    d = np.linalg.norm(cell_opt.coords[1] - cell_opt.coords[0])
    assert 1.3 < d < 1.75
    assert info["e_tot"] < -1.08


def test_diamond_forces_vnl_and_symmetry():
    """Diamond (C: s+p GTH projectors): the traced energy matches the
    SCF, forces on the two sublattice atoms cancel at the symmetric
    geometry, and an FD check passes for a distorted cell."""
    cell = diamond_primitive(mesh=(14, 14, 14))
    system, res = _converge(cell, "lda,vwn")
    g, e_chk = rhf_gradient(system, res, xc="lda,vwn", return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-9
    # equilibrium symmetric diamond: forces vanish up to the grid
    # egg-box noise of the collocation mesh (the gradient is exact for
    # the mesh-truncated energy — FD below agrees to ~1e-9 — but the
    # energy itself ripples with sub-gridpoint translations)
    assert np.abs(g).max() < 5e-4
    # translational invariance (net force) holds much more tightly
    assert np.abs(g.sum(axis=0)).max() < 2e-5

    def distorted(dx):
        a0 = np.array([[0.0, 1.7834, 1.7834], [1.7834, 0.0, 1.7834],
                       [1.7834, 1.7834, 0.0]])
        return build_cell(a0, [["C", (dx, 0.0, 0.0)],
                               ["C", (0.9517, 0.8917, 0.8917)]],
                          basis="gth-szv", pseudo="gth-pade",
                          mesh=[14] * 3, unit="Angstrom")

    system, res = _converge(distorted(0.0), "lda,vwn")
    g = rhf_gradient(system, res, xc="lda,vwn")
    h = 2e-4   # Bohr offsets applied in Angstrom input: convert below
    from pyscf_isdf_tpu.cell import BOHR
    _, rp = _converge(distorted(+h * BOHR), "lda,vwn")
    _, rm = _converge(distorted(-h * BOHR), "lda,vwn")
    fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
    assert abs(g[0, 0] - fd) < 5e-6


def test_rohf_gradient_vs_fd():
    """ROHF/ROKS forces (H3 radical) vs FD — exercises the
    non-canonical Pulay weight W = D_a F_a D_a + D_b F_b D_b
    (reference pyscf/grad/rohf.py make_rdm1e); the Roothaan canonical
    eigenvalues would give the WRONG Pulay term here."""
    from pyscf_isdf_tpu.scf.rohf import rohf_kernel
    from pyscf_isdf_tpu.grad.uhf import rohf_gradient

    def setup(dx, xc):
        L = 7.0
        cell = build_cell(np.eye(3) * L,
                          [["H", (L / 2 - 1.0 + dx, L / 2, L / 2)],
                           ["H", (L / 2 + 0.4, L / 2 + 0.1, L / 2)],
                           ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                          basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3,
                          spin=1)
        system = build_scf_system(cell)
        res = rohf_kernel(system, xc=xc, exxdiv="ewald", conv_tol=1e-13)
        assert res["converged"]
        return system, res

    for xc in (None, "lda,vwn"):
        system, res = setup(0.0, xc)
        g, e_chk = rohf_gradient(system, res, xc=xc, return_energy=True)
        assert abs(e_chk - res["e_tot"]) < 1e-9
        h = 2e-4
        _, rp = setup(+h, xc)
        _, rm = setup(-h, xc)
        fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
        assert abs(g[0, 0] - fd) < 5e-7
