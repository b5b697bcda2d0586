"""Spin-polarized SCF (UHF/UKS) parity and consistency.

Golden anchor: Si2 UKS lda,vwn = -7.6162130840535092
(pyscf/pbc/dft/test/test_uks.py:45-69, gth-szv/gth-pade, mesh [17]^3).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.uhf import uhf_kernel


@pytest.fixture(scope="module")
def si2_system():
    cell = build_cell(
        np.diag([5.4306975] * 3),
        "Si 2.7153487 2.7153487 0; Si 2.7153487 0 2.7153487",
        basis="gth-szv", pseudo="gth-pade", mesh=[17] * 3, unit="Angstrom",
    )
    return build_scf_system(cell)


def test_uks_si2_lda_golden(si2_system):
    res = uhf_kernel(si2_system, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-7.6162130840535092, abs=1e-7)
    assert res["s_squared"] == pytest.approx(0.0, abs=1e-8)


def test_uhf_matches_rhf_closed_shell(si2_system):
    res_u = uhf_kernel(si2_system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    res_r = scf_kernel(si2_system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert res_u["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-9)


def test_uks_pbe_matches_rks_closed_shell(si2_system):
    res_u = uhf_kernel(si2_system, xc="pbe", conv_tol=1e-9)
    res_r = scf_kernel(si2_system, xc="pbe", conv_tol=1e-9)
    assert res_u["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-8)


def test_lsda_polarization_limits():
    """zeta=0 reduces to the unpolarized functional; zeta=1 exchange gains 2^(1/3)."""
    from pyscf_isdf_tpu.ops.xc import _exc_lsda, _ex_slater, _ec_vwn5

    rho = jnp.array([0.05, 0.5, 5.0])
    half = rho / 2
    # unpolarized limit
    exc0 = _exc_lsda(half, half)
    assert np.allclose(exc0, _ex_slater(rho) + _ec_vwn5(rho), atol=1e-12)
    # fully polarized exchange
    zero = jnp.full_like(rho, 1e-30)
    exc1 = _exc_lsda(rho, zero)
    ex_part = _ex_slater(2 * rho) * 2 * rho / (2 * rho)  # = ex(2 rho)
    assert np.allclose(
        exc1 - (exc1 - 2 ** (1.0 / 3) * _ex_slater(rho)), 2 ** (1.0 / 3) * _ex_slater(rho),
        atol=1e-12,
    )


def test_open_shell_h_atom():
    """One H atom in a box: UHF with (1,0) electrons runs and <S^2>=0.75."""
    cell = build_cell(
        np.eye(3) * 6.0, [["H", (3.0, 3.0, 3.0)]],
        basis=[[0, (1.3, 1.0)], [0, (0.4, 1.0)]],
        mesh=[25] * 3, spin=1,
    )
    system = build_scf_system(cell)
    res = uhf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    assert res["converged"]
    assert res["s_squared"] == pytest.approx(0.75, abs=1e-6)
    # polarized channels genuinely differ
    assert abs(res["dm"][0] - res["dm"][1]).max() > 0.1
