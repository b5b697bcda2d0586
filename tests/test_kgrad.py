"""k-point autodiff nuclear gradients vs finite differences.

grad/khf.py traces the kscf energy functional (1/nk traces, (k1,k2)
exchange pair densities, ewald madelung shift) through positions.
Accuracy note (measured): the fixed-(D,W) gradient is exact only at the
SCF stationary point; with exact exchange the madelung cancellation
(Tr(DSDS)=2*nelec along the SCF path) amplifies the DM residual, so the
HF case is converged to 1e-15 here.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.grad.khf import krhf_gradient


def _setup(dx, xc, tol):
    L = 6.0
    cell = build_cell(np.array([[2.9, 0, 0], [0, L, 0], [0, 0, L]]),
                      [["H", (0.0 + dx, L / 2, L / 2)],
                       ["H", (1.25, L / 2 + 0.1, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[8, 14, 14])
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=xc, exxdiv="ewald", conv_tol=tol,
                      max_cycle=200)
    assert res["converged"]
    return system, res


@pytest.mark.parametrize("xc,tol,bar", [
    (None, 1e-15, 5e-7),        # HF: bounded by DM residual (see module doc)
    ("lda,vwn", 1e-12, 1e-7),
    ("pbe", 1e-12, 1e-7),
    ("hse06", 1e-15, 5e-7),   # RSH: hyb*K_full + (a-hyb)*K_LR(w)
])
def test_kpoint_gradient_vs_fd(xc, tol, bar):
    system, res = _setup(0.0, xc, tol)
    g, e_chk = krhf_gradient(system, res, xc=xc, return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-10
    h = 5e-4
    _, rp = _setup(+h, xc, tol)
    _, rm = _setup(-h, xc, tol)
    fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
    assert abs(g[0, 0] - fd) < bar


def test_kuks_gradient_vs_fd():
    """k-point spin-polarized forces (H3 radical chain, KUKS-LDA)."""
    from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel
    from pyscf_isdf_tpu.grad.kuhf import kuhf_gradient

    def setup(dx):
        L = 6.0
        cell = build_cell(np.array([[3.4, 0, 0], [0, L, 0], [0, 0, L]]),
                          [["H", (0.0 + dx, L / 2, L / 2)],
                           ["H", (1.45, L / 2 + 0.2, L / 2)],
                           ["H", (2.4, L / 2, L / 2)]],
                          basis="gth-szv", pseudo="gth-pade",
                          mesh=[10, 14, 14], spin=1)
        kpts = lattice.make_kpts(cell.a, [2, 1, 1])
        system = build_kscf_system(cell, kpts)
        res = kuhf_kernel(system, xc="lda,vwn", exxdiv="ewald",
                          conv_tol=1e-13, max_cycle=200)
        assert res["converged"]
        return system, res

    system, res = setup(0.0)
    g, e_chk = kuhf_gradient(system, res, xc="lda,vwn",
                             return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-10
    h = 2e-4
    _, rp = setup(+h)
    _, rm = setup(-h)
    fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
    assert abs(g[0, 0] - fd) < 5e-7
