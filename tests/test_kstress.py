"""k-point stress tensor (strain autodiff) vs finite strain differences.

Under strain the k-points transform contragradiently, making k.T and
q.r phase tables strain-invariant — grad/kstress.py traces everything
else. EXCEEDS the reference (no PBC stress in pyscf).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.grad.kstress import kstress_tensor

A0 = np.array([[2.9, 0, 0], [0, 6.0, 0], [0, 0, 6.0]])
P0 = np.array([[0.0, 3.0, 3.0], [1.25, 3.1, 3.0]])


def _conv(eps, xc):
    F = np.eye(3) + eps
    cell = build_cell(A0 @ F.T, [["H", tuple(P0[0] @ F.T)],
                                 ["H", tuple(P0[1] @ F.T)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[8, 14, 14])
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=xc, exxdiv="ewald", conv_tol=1e-14,
                      max_cycle=200)
    assert res["converged"]
    return system, res


@pytest.mark.parametrize("xc,bar", [("lda,vwn", 1e-6), (None, 1e-6),
                                    ("hse06", 2e-6)])
def test_kpoint_stress_vs_fd(xc, bar):
    system, res = _conv(np.zeros((3, 3)), xc)
    sig, e_chk, g = kstress_tensor(system, res, xc=xc, return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-9
    h = 1e-4
    for M in (np.diag([1.0, 0, 0]),
              np.array([[0, .5, 0], [.5, 0, 0], [0, 0, 0]])):
        _, rp = _conv(+h * M, xc)
        _, rm = _conv(-h * M, xc)
        fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
        assert abs(np.sum(g * M) - fd) < bar
