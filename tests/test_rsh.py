"""Range-separated hybrid (HSE06) exchange: functional limits + SCF parity.

Reference contract: pyscf/pbc/dft/rks.py:108-121 (omega/alpha/hyb K
assembly) + pyscf/pbc/tools/pbc.py:408-418 (omega-scaled kernels). The
SR-PBE semilocal part uses ITH local-wavevector screening (see
ops/xc.py:_fx_sr) with limits pinned here against independent oracles.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.ops.xc import (
    XCSpec, _sr_lda_factor, _fx_sr, _fx_pbe,
)
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel


def test_sr_lda_factor_vs_exact_hole_integral():
    """Closed-form erfc attenuation == direct integration of the exact UEG
    exchange hole n_x(u) = -(9 rho/2) [j1(kF u)/(kF u)]^2."""
    from scipy.integrate import quad
    from scipy.special import erfc

    def j1(t):
        return (np.sin(t) - t * np.cos(t)) / t**2

    for a in (0.02, 0.1, 0.3, 0.7, 1.5):
        num = quad(lambda t: (j1(t) / t) ** 2 * t * erfc(2 * a * t),
                   0, 200, limit=500)[0]
        den = quad(lambda t: (j1(t) / t) ** 2 * t, 0, 200, limit=500)[0]
        exact = num / den
        closed = float(_sr_lda_factor(jnp.asarray(a)))
        assert closed == pytest.approx(exact, abs=5e-5)  # quad tolerance


def test_fx_sr_limits():
    # omega -> 0 recovers the PBE enhancement exactly
    for s2 in (0.0, 0.3, 1.0, 4.0, 25.0):
        assert float(_fx_sr(jnp.asarray(s2), jnp.asarray(0.0))) == \
            pytest.approx(float(_fx_pbe(jnp.asarray(s2))), rel=1e-12)
    # s -> 0 recovers the exact UEG attenuation
    for nu in (0.1, 0.5, 2.0):
        assert float(_fx_sr(jnp.asarray(0.0), jnp.asarray(nu))) == \
            pytest.approx(float(_sr_lda_factor(jnp.asarray(nu / 2))),
                          rel=1e-12)
    # large omega kills the SR exchange
    assert float(_fx_sr(jnp.asarray(1.0), jnp.asarray(50.0))) < 1e-3


def test_hse06_spec():
    spec = XCSpec("hse06")
    assert spec.family == "gga"
    assert spec.hyb == 0.25
    assert spec.alpha == 0.0
    assert spec.omega == 0.11
    # functional value sanity: hse06 semilocal exc lies between pbe and pbe0
    rho = jnp.asarray([0.5, 1.0, 2.0])
    sigma = jnp.asarray([0.1, 0.5, 1.0])
    e_hse, _, _ = spec.exc_vxc(rho, sigma)
    e_pbe, _, _ = XCSpec("pbe").exc_vxc(rho, sigma)
    e_pbe0, _, _ = XCSpec("pbe0").exc_vxc(rho, sigma)
    assert np.all(np.asarray(e_hse) < np.asarray(e_pbe0)  # less removed
                  + 1e-12)
    assert np.all(np.asarray(e_hse) > np.asarray(e_pbe) - 1e-12)


@pytest.fixture(scope="module")
def gamma_sys():
    return build_scf_system(diamond_primitive(mesh=(15, 15, 15)))


def test_hse06_gamma_scf_isdf_parity(gamma_sys):
    """HSE06 SCF: ISDF omega-split K (second W_sr) == FFTDF omega-split K.

    The VERDICT r1 item-4 done-bar: parity to 1e-8.
    """
    ref = scf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10)
    assert ref["converged"]
    res = scf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10, df="isdf",
                     isdf_c=10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)
    # and HSE06 is between PBE and PBE0 for this insulator
    e_pbe = scf_kernel(gamma_sys, xc="pbe", conv_tol=1e-10)["e_tot"]
    e_pbe0 = scf_kernel(gamma_sys, xc="pbe0", conv_tol=1e-10)["e_tot"]
    assert min(e_pbe, e_pbe0) - 0.05 < ref["e_tot"] < max(e_pbe, e_pbe0) + 0.05


def test_hse06_kpts_scf_isdf_parity():
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    ref = kscf_kernel(system, xc="hse06", conv_tol=1e-9)
    assert ref["converged"]
    res = kscf_kernel(system, xc="hse06", conv_tol=1e-9, df="isdf", isdf_c=10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_hse06_uks_matches_rks(gamma_sys):
    """Closed-shell UKS/HSE06 (spin path) == RKS/HSE06."""
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel

    ref = scf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10)
    res = uhf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_hse06_kuks_matches_krks():
    """Closed-shell KUKS/HSE06 (per-spin k exchange + RSH madelung) ==
    KRKS/HSE06 (VERDICT r2 missing #6: RSH uniformity)."""
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel

    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    ref = kscf_kernel(system, xc="hse06", conv_tol=1e-10)
    res = kuhf_kernel(system, xc="hse06", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_hse06_rohf_limits(gamma_sys):
    """Closed-shell ROKS/HSE06 == RKS/HSE06 (Roothaan Fock collapses to
    the restricted operator when na == nb)."""
    from pyscf_isdf_tpu.scf.rohf import rohf_kernel

    ref = scf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10)
    res = rohf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_hse06_krohf_limits():
    """Closed-shell KROKS/HSE06 == KRKS/HSE06."""
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.scf.krohf import krohf_kernel

    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    ref = kscf_kernel(system, xc="hse06", conv_tol=1e-10)
    res = krohf_kernel(system, xc="hse06", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


@pytest.mark.slow
def test_hse06_ibz_matches_full_bz():
    """IBZ (khf_ksymm) HSE06 == full-BZ KRKS/HSE06 with nk_ibz < nk.

    Needs the 24^3 mesh of the other ksymm hybrid tests: the exchange
    pair densities are symmetric only up to grid aliasing (measured
    ~6e-6 at 16^3, both for HSE06 and PBE0; decays with mesh), so the
    bar matches test_ksymm's hybrid tolerance.
    """
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.scf.khf_ksymm import kscf_ibz_kernel

    cell = diamond_primitive(mesh=(24, 24, 24))
    kpts = lattice.make_kpts(cell.a, [2, 2, 2])
    system = build_kscf_system(cell, kpts)
    ref = kscf_kernel(system, xc="hse06", conv_tol=1e-9)
    res = kscf_ibz_kernel(system, xc="hse06", conv_tol=1e-9)
    assert res["converged"]
    assert len(res["mo_energy"]) < len(kpts)
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=2e-7)


def test_hse06_gdf_gamma(gamma_sys):
    """df='gdf' with HSE06 (dual full+LR Coulomb-metric fits): lands
    within fitting accuracy of the exact FFT exchange path."""
    ref = scf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10)
    res = scf_kernel(gamma_sys, xc="hse06", conv_tol=1e-10, df="gdf")
    assert res["converged"]
    assert abs(res["e_tot"] - ref["e_tot"]) < 2e-4


def test_hse06_gdf_kpts():
    """k-point df='gdf' with HSE06 == FFT path within fit accuracy."""
    import numpy as np
    from pyscf_isdf_tpu import build_cell, lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    L = 6.0
    cell = build_cell(np.array([[2.9, 0, 0], [0, L, 0], [0, 0, L]]),
                      [["H", (0.0, L / 2, L / 2)],
                       ["H", (1.25, L / 2 + 0.1, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[10, 14, 14])
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    system = build_kscf_system(cell, kpts)
    ref = kscf_kernel(system, xc="hse06", conv_tol=1e-10)
    res = kscf_kernel(system, xc="hse06", conv_tol=1e-10, df="gdf")
    assert res["converged"]
    assert abs(res["e_tot"] - ref["e_tot"]) < 2e-5
