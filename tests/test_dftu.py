"""DFT+U (Dudarev) on k-point KS-DFT.

Reference contract: pyscf/pbc/dft/krkspu.py. Oracles: the U=0 limit and
the Hellmann-Feynman derivative dE/dU = sum_s (1/2)(Tr n_s - Tr n_s^2)
at the U=0 density (variational consistency of the implementation).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.dftu import HubbardU
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel


@pytest.fixture(scope="module")
def ksys():
    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    return cell, build_kscf_system(cell, kpts)


def test_u_zero_limit(ksys):
    cell, system = ksys
    ref = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-10,
                      hubbard=[("C", 1, 0.0)])
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-12)


def test_hellmann_feynman_dU(ksys):
    """dE/dU at U->0 equals the analytic occupation expression evaluated
    with the U=0 density."""
    cell, system = ksys
    ref = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-11)
    hub = HubbardU(cell, system.S, [("C", 1, 1.0)])
    e1_per_u, _ = hub.energy_and_potential(ref["dm"])  # E_U at U=1

    dU = 1e-4
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-11,
                      hubbard=[("C", 1, dU)])
    dEdU = (res["e_tot"] - ref["e_tot"]) / dU
    # first-order response: slope equals E_U(U=1) at the frozen density
    assert dEdU == pytest.approx(e1_per_u, rel=1e-3)


def test_u_opens_gap(ksys):
    """A Hubbard U on the carbon p shell shifts the p-band energetics:
    total energy rises (fractional occupations are penalized) and the
    correction magnitude is physically small for U=0.1 Ha."""
    cell, system = ksys
    ref = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-10,
                      hubbard=[("C", 1, 0.1)])
    assert res["converged"]
    de = res["e_tot"] - ref["e_tot"]
    assert 0.0 < de < 0.5


def test_frontend_krkspu(ksys):
    import pyscf_isdf_tpu as pit

    cell, system = ksys
    kpts = system.kpts
    mf = pit.KRKSpU(cell, kpts, xc="lda,vwn", hubbard=[("C", 1, 0.05)])
    e = mf.kernel()
    assert mf.converged
    e0 = pit.KRKS(cell, kpts, xc="lda,vwn").run()
    assert e > e0
