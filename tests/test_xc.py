"""XC functional validation.

VWN5+Slater are pinned by the LDA golden-energy parity tests
(test_scf_rks.py, 5e-10 agreement). PBE has no in-repo golden anchor, so it
is validated by exact physical invariants:
  * sigma -> 0 limit == PW92 LDA correlation + Slater exchange,
  * small-s expansion of the exchange enhancement F_x = 1 + mu s^2 + O(s^4),
  * the assembled GGA Vxc matrix equals the numerical derivative
    dExc/dD_ij (validates vrho/vsigma AND the spectral-gradient matrix
    construction end-to-end).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu.ops.xc import XCSpec, _ex_slater, _ec_pw92, _ex_pbe, _ec_pbe
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.hf import _vxc_gga
from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft


def test_slater_exchange_value():
    # ex = -(3/4)(3/pi)^{1/3} rho^{1/3}; at rho=1: -0.7385587663820224
    assert float(_ex_slater(jnp.array(1.0))) == pytest.approx(
        -0.75 * (3 / np.pi) ** (1 / 3), rel=1e-12
    )


def test_pbe_uniform_limit():
    rho = jnp.array([0.01, 0.1, 1.0, 10.0])
    zero = jnp.zeros_like(rho)
    assert np.allclose(_ex_pbe(rho, zero), _ex_slater(rho), atol=1e-12)
    assert np.allclose(_ec_pbe(rho, zero), _ec_pw92(rho), atol=1e-12)


def test_pbe_exchange_small_s_expansion():
    mu = 0.2195149727645171
    rho = jnp.array(0.5)
    kf = (3 * np.pi**2 * 0.5) ** (1 / 3)
    for s in [1e-3, 1e-2]:
        sigma = jnp.array((s * 2 * kf * 0.5) ** 2)
        fx = float(_ex_pbe(rho, sigma) / _ex_slater(rho))
        assert fx == pytest.approx(1 + mu * s**2, abs=1e-6)


def test_gga_vxc_is_derivative_of_exc():
    cell = diamond_primitive(mesh=(12, 12, 12))
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-8)
    dm = res["dm"]
    xc = XCSpec("pbe")
    aoR = system.aoR
    ao_grad = ao_gradient_fft(aoR, system.mesh, jnp.asarray(system.Gv))

    def exc_of(dm):
        e, _, _ = _vxc_gga(aoR, ao_grad, jnp.asarray(dm), system.weight, xc,
                           system.mesh)
        return float(e)

    _, vxc, _ = _vxc_gga(aoR, ao_grad, jnp.asarray(dm), system.weight, xc,
                         system.mesh)
    vxc = np.asarray(vxc)
    rng = np.random.RandomState(0)
    for _ in range(3):
        i, j = rng.randint(0, cell.nao, 2)
        h = 1e-6
        pert = np.zeros_like(dm)
        pert[i, j] += h
        pert[j, i] += h
        num = (exc_of(dm + pert) - exc_of(dm - pert)) / (2 * h)
        ana = vxc[i, j] + vxc[j, i]
        assert num == pytest.approx(ana, abs=1e-6, rel=1e-5)


def test_pbesol_limits():
    """PBEsol (PRL 100, 136406): uniform limit == LSDA exactly; the
    exchange small-s expansion slope is the restored GE2 value 10/81
    (vs PBE's 0.21952); correlation beta = 0.046 changes H."""
    from pyscf_isdf_tpu.ops.xc import _ec_pw92

    spec = XCSpec("pbesol")
    rho = jnp.asarray([0.1, 1.0, 5.0])
    e, _, _ = spec.exc_vxc(rho, jnp.full_like(rho, 1e-30))
    assert np.abs(np.asarray(
        e - (_ex_slater(rho) + _ec_pw92(rho)))).max() < 1e-12
    kf = (3 * np.pi**2 * 0.5) ** (1 / 3)
    for s in [1e-3, 1e-2]:
        sigma = jnp.array((s * 2 * kf * 0.5) ** 2)
        fx = float(_ex_pbe(jnp.array(0.5), sigma, mu=10.0 / 81.0)
                   / _ex_slater(jnp.array(0.5)))
        assert fx == pytest.approx(1 + (10.0 / 81.0) * s**2, abs=1e-6)


def test_pbesol_scf_and_spin_consistency():
    """PBEsol SCF converges; the spin-resolved path at zeta = 0 equals
    the restricted path (same invariant that pins the PBE family)."""
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel

    system = build_scf_system(diamond_primitive(mesh=(14, 14, 14)))
    res_r = scf_kernel(system, xc="pbesol", conv_tol=1e-9)
    res_u = uhf_kernel(system, xc="pbesol", conv_tol=1e-9)
    assert res_r["converged"] and res_u["converged"]
    assert res_u["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-8)
    # PBEsol != PBE on a real density (the constants actually differ)
    res_pbe = scf_kernel(system, xc="pbe", conv_tol=1e-9)
    assert abs(res_pbe["e_tot"] - res_r["e_tot"]) > 1e-4
