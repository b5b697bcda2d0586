"""G0W0 and RPA: production AC path vs the exact-spectral oracle.

Test strategy mirrors the reference's (SURVEY §4): the dense
exact-frequency G0W0 (gw/gw_exact.py, the gw_exact.py analog) is the
in-tree first-principles oracle for the production GW-AC path
(gw/rgw.py, krgw_ac.py analog); both consume the SAME whitened DF
tensor so the density-fitting error cancels and only quadrature + Pade
error remains.  The RPA correlation energy is pinned by the exact
plasmon-formula identity Ec = 1/2 (sum_v Omega_v - tr A).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu.models import diamond_primitive, diamond_supercell
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.gw import rgw, gw_exact, krgw
from pyscf_isdf_tpu import lattice


@pytest.fixture(scope="module")
def lda12():
    cell = diamond_primitive(mesh=(12, 12, 12))
    sys_ = build_scf_system(cell)
    res = scf_kernel(sys_, xc="lda,vwn")
    assert res["converged"]
    Lmo = rgw.build_lmo(sys_, res["mo_coeff"])
    return cell, sys_, res, Lmo


def test_gw_ac_vs_exact(lda12):
    """AC (quadrature + Pade + Newton) against the Lehmann-sum oracle,
    every orbital: residual is pure continuation error."""
    _, sys_, res, Lmo = lda12
    out = rgw.gw_ac_gamma(sys_, res, xc="lda,vwn", Lmo=Lmo)
    qp_ex, conv = gw_exact.gw_exact_gamma(sys_, res, xc="lda,vwn", Lmo=Lmo)
    assert out.converged and conv
    assert np.abs(out.qp_energy - qp_ex).max() < 5e-6
    # GW must open the LDA gap (diamond: LDA underestimates)
    nocc = out.nocc
    gap_ks = res["mo_energy"][nocc] - res["mo_energy"][nocc - 1]
    gap_gw = out.qp_energy[nocc] - out.qp_energy[nocc - 1]
    assert gap_gw > gap_ks
    # QP renormalization: 0 < Z < 1, near 1 for this weakly
    # correlated solid (measured 0.97-0.99)
    assert np.all(out.qp_weight > 0.8) and np.all(out.qp_weight < 1.0)


def test_rpa_plasmon_identity(lda12):
    """Quadrature Ec equals the plasmon formula to quadrature error."""
    _, sys_, res, Lmo = lda12
    ec_q = rgw.rpa_ecorr_gamma(sys_, res, Lmo=Lmo)
    ec_p = gw_exact.rpa_ecorr_plasmon(
        res["mo_energy"], sys_.nelec // 2, Lmo)
    assert ec_p < -0.05          # correlation is bound and nonzero
    assert abs(ec_q - ec_p) < 1e-10


def test_gw_at_hf_sigma_x_cancels(lda12):
    """GW@HF: v_mf IS the exchange, so (vx - v_mf) = 0 exactly; and the
    G0W0 gap is starting-point robust — GW@HF and GW@LDA agree to tens
    of meV while the underlying HF/LDA gaps differ by ~0.65 Ha."""
    cell, sys_l, res_l, Lmo_l = lda12
    sys_ = build_scf_system(cell)
    res = scf_kernel(sys_, xc=None)
    out = rgw.gw_ac_gamma(sys_, res, xc=None)
    assert np.abs(out.sigma_x - out.v_mf).max() < 1e-12
    nocc = out.nocc
    gap_hf = res["mo_energy"][nocc] - res["mo_energy"][nocc - 1]
    gap_gw_hf = out.qp_energy[nocc] - out.qp_energy[nocc - 1]
    out_l = rgw.gw_ac_gamma(sys_l, res_l, xc="lda,vwn", Lmo=Lmo_l)
    gap_ks = res_l["mo_energy"][nocc] - res_l["mo_energy"][nocc - 1]
    gap_gw_ks = out_l.qp_energy[nocc] - out_l.qp_energy[nocc - 1]
    assert abs(gap_hf - gap_ks) > 0.5          # starting points far apart
    assert abs(gap_gw_hf - gap_gw_ks) < 0.05   # QP gaps agree


def test_kgw_gamma_limit(lda12):
    """1x1x1 k-mesh GW == Gamma GW (complex k machinery vs real)."""
    cell, sys_g, res_g, _ = lda12
    out_g = rgw.gw_ac_gamma(sys_g, res_g, xc="lda,vwn")
    sys_k = build_kscf_system(cell, np.zeros((1, 3)))
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    out_k = krgw.kgw_ac(sys_k, res_k, xc="lda,vwn")
    assert np.abs(out_g.qp_energy - out_k.qp_energy[0]).max() < 1e-6


def test_evgw_starting_point_independence(lda12):
    """evGW fixed points from LDA and HF starts agree far more closely
    than the G0W0 results do (the self-consistency removes the
    starting-point dependence)."""
    cell, sys_l, res_l, Lmo_l = lda12
    sys_h = build_scf_system(cell)
    res_h = scf_kernel(sys_h, xc=None)
    nocc = sys_l.nelec // 2

    g0_l = rgw.gw_ac_gamma(sys_l, res_l, xc="lda,vwn", Lmo=Lmo_l)
    g0_h = rgw.gw_ac_gamma(sys_h, res_h, xc=None)
    ev_l = rgw.evgw_gamma(sys_l, res_l, xc="lda,vwn", Lmo=Lmo_l)
    ev_h = rgw.evgw_gamma(sys_h, res_h, xc=None)
    assert ev_l.converged and ev_h.converged

    def gap(o):
        return o.qp_energy[nocc] - o.qp_energy[nocc - 1]

    d_g0 = abs(gap(g0_l) - gap(g0_h))
    d_ev = abs(gap(ev_l) - gap(ev_h))
    assert d_ev < 0.6 * d_g0          # self-consistency tightens
    assert d_ev < 0.02


def test_sigma_iw_sharded(lda12):
    """Frequency-sharded self-energy == single-device to 1e-12 on the
    8-virtual-device mesh (nw=100 pads to 104)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from pyscf_isdf_tpu.parallel.gw_sharded import sigma_iw_sharded

    _, sys_, res, Lmo = lda12
    mo_energy = np.asarray(res["mo_energy"], np.float64)
    nocc = sys_.nelec // 2
    ef = 0.5 * (mo_energy[nocc - 1] + mo_energy[nocc])
    freqs, wts = rgw.scaled_legendre(100)
    nw_sigma = int(np.sum(freqs < 5.0)) + 1
    omega_grid = np.zeros(nw_sigma)
    omega_grid[1:] = freqs[: nw_sigma - 1]

    ref = np.asarray(rgw._sigma_iw_batched(
        Lmo, jnp.asarray(mo_energy), nocc, jnp.asarray(freqs),
        jnp.asarray(wts), jnp.asarray(omega_grid), ef))
    mesh = Mesh(np.array(jax.devices()[:8]), ("w",))
    out = np.asarray(sigma_iw_sharded(
        Lmo, jnp.asarray(mo_energy), nocc, jnp.asarray(freqs),
        jnp.asarray(wts), jnp.asarray(omega_grid), ef, mesh))
    assert np.abs(out - ref).max() < 1e-12


def test_kgw_fc_head_wing(lda12):
    """q->0 head/wing finite-size correction: finite, reduces the gap
    (the missing q=0 screening always over-opens it), and leaves the
    no-fc path untouched."""
    cell, _, _, _ = lda12
    sys_k = build_kscf_system(cell, np.zeros((1, 3)))
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    out0 = krgw.kgw_ac(sys_k, res_k, xc="lda,vwn")
    out1 = krgw.kgw_ac(sys_k, res_k, xc="lda,vwn", fc=True)
    n = out0.nocc
    g0 = out0.qp_energy[0, n] - out0.qp_energy[0, n - 1]
    g1 = out1.qp_energy[0, n] - out1.qp_energy[0, n - 1]
    assert np.isfinite(out1.qp_energy).all()
    assert g1 < g0                     # head correction screens
    assert g0 - g1 < 1.0               # bounded magnitude


def test_frontend_gw_rpa():
    import pyscf_isdf_tpu as pit

    cell = diamond_primitive(mesh=(12, 12, 12))
    mf = pit.RKS(cell, xc="pbe")
    mf.run()
    out = pit.GW(mf, orbs=[3, 4])
    assert out.qp_energy.shape == (8,)
    ec, etot = pit.RPA(mf)
    assert ec < 0

    mfh = pit.RHF(cell)
    mfh.run()
    ec_h, _ = pit.RPA(mfh)
    assert ec_h < 0


@pytest.mark.slow
def test_kgw_supercell_parity():
    """2x1x1 k-sampled GW == Gamma supercell GW (HOMO/LUMO QP levels).

    The supercell spectrum contains both k-points' levels; compare the
    QP HOMO and LUMO (band edges are common to both representations)."""
    mesh = (12, 12, 12)
    cell = diamond_primitive(mesh=mesh)
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    sys_k = build_kscf_system(cell, kpts)
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    out_k = krgw.kgw_ac(sys_k, res_k, xc="lda,vwn")

    sc = diamond_supercell(nrep=(2, 1, 1), mesh=(24, 12, 12))
    sys_s = build_scf_system(sc)
    res_s = scf_kernel(sys_s, xc="lda,vwn")
    out_s = rgw.gw_ac_gamma(sys_s, res_s, xc="lda,vwn")

    nocc_k = out_k.nocc
    homo_k = out_k.qp_energy[:, nocc_k - 1].max()
    lumo_k = out_k.qp_energy[:, nocc_k].min()
    nocc_s = out_s.nocc
    homo_s = out_s.qp_energy[nocc_s - 1]
    lumo_s = out_s.qp_energy[nocc_s]
    # independent GDF builds (primitive complex vs supercell real) set
    # the agreement floor
    assert abs(homo_k - homo_s) < 2e-3
    assert abs(lumo_k - lumo_s) < 2e-3


def test_krpa_gamma_limit(lda12):
    """k-point RPA Ec at 1x1x1 == the Gamma-path quadrature (different
    code paths: complex per-q whitening vs real Gamma GDF)."""
    from pyscf_isdf_tpu.gw.krgw import rpa_ecorr_kpts

    cell, sys_g, res_g, Lmo = lda12
    ec_g = rgw.rpa_ecorr_gamma(sys_g, res_g, Lmo=Lmo)
    sys_1 = build_kscf_system(cell, np.zeros((1, 3)))
    res_1 = kscf_kernel(sys_1, xc="lda,vwn")
    ec_1 = rpa_ecorr_kpts(sys_1, res_1)
    assert abs(ec_g - ec_1) < 1e-8


@pytest.mark.slow
def test_krpa_supercell_parity():
    """2x1x1 per-cell RPA Ec == Gamma-supercell Ec / 2 (the q-block
    trace decomposition; independent DF builds set the ~5e-6 floor)."""
    from pyscf_isdf_tpu.gw.krgw import rpa_ecorr_kpts

    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    sys_k = build_kscf_system(cell, kpts)
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    ec_k = rpa_ecorr_kpts(sys_k, res_k)
    sc = diamond_supercell(nrep=(2, 1, 1), mesh=(24, 12, 12))
    sys_s = build_scf_system(sc)
    res_s = scf_kernel(sys_s, xc="lda,vwn")
    ec_s = rgw.rpa_ecorr_gamma(sys_s, res_s)
    assert abs(ec_k - ec_s / 2.0) < 5e-5


@pytest.mark.heavy
def test_dielectric_constant_diamond():
    """Macroscopic eps_infinity from the q->0 inverse-dielectric head:
    physical magnitude for diamond (exp. 5.7; szv/2x2x2 gives ~6.4) and
    exact cubic directional symmetry."""
    from pyscf_isdf_tpu.gw.krgw import dielectric_constant

    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 2, 2])
    sys_k = build_kscf_system(cell, kpts)
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    from pyscf_isdf_tpu.gw.krgw import build_lmo_kpts

    Lmo = build_lmo_kpts(sys_k, res_k["mo_coeff"])
    ex = dielectric_constant(sys_k, res_k, (1, 0, 0), Lmo=Lmo)
    ez = dielectric_constant(sys_k, res_k, (0, 0, 1), Lmo=Lmo)
    assert 3.0 < ex < 12.0
    assert abs(ex - ez) < 1e-8          # cubic symmetry


def test_kgw_gga_gamma_limit():
    """k-GW on a GGA (PBE) reference: the complex k machinery's v_mf
    (vxc_kpts GGA quadrature) must reproduce the Gamma path."""
    cell = diamond_primitive(mesh=(12, 12, 12))
    sys_g = build_scf_system(cell)
    res_g = scf_kernel(sys_g, xc="pbe")
    out_g = rgw.gw_ac_gamma(sys_g, res_g, xc="pbe")
    sys_k = build_kscf_system(cell, np.zeros((1, 3)))
    res_k = kscf_kernel(sys_k, xc="pbe")
    out_k = krgw.kgw_ac(sys_k, res_k, xc="pbe")
    # inputs agree to 4e-8 (KS/vx/vmf measured) but the QP Newton +
    # Pade amplify the two drivers' GGA-quadrature difference ~100x
    assert np.abs(out_g.sigma_x - out_k.sigma_x[0]).max() < 1e-7
    assert np.abs(out_g.v_mf - out_k.v_mf[0]).max() < 1e-6
    assert np.abs(out_g.qp_energy - out_k.qp_energy[0]).max() < 1e-5


def test_gw_cd_vs_exact(lda12):
    """Contour deformation against the Lehmann-sum oracle: (a) the CD
    self-energy pointwise at REAL frequencies — including a point 2 Ha
    below the valence band where every occupied pole is crossed (the
    deep-core regime the Pade continuation cannot reach) — and (b) the
    Newton QP energies orbital by orbital."""
    from pyscf_isdf_tpu.gw import gw_cd

    _, sys_, res, Lmo = lda12
    mo_e = np.asarray(res["mo_energy"])
    nocc = sys_.nelec // 2
    ef = 0.5 * (mo_e[nocc - 1] + mo_e[nocc])

    omega_v, xpy, _, _ = gw_exact.drpa_diagonalize(mo_e, nocc,
                                                   np.asarray(Lmo))
    Lov = np.asarray(Lmo)[:, :nocc, nocc:]
    rho_v = np.einsum("via,Pia->vP", xpy, Lov)
    tdm = np.sqrt(2.0) * np.einsum("vP,Ppq->vpq", rho_v, np.asarray(Lmo))

    freqs, wts = rgw.scaled_legendre(200)
    import jax.numpy as jnp
    Wiw = np.asarray(gw_cd._w_batched_z(
        Lmo, jnp.asarray(mo_e), nocc, jnp.asarray(-freqs**2 + 0j)))
    for p, w in [(0, mo_e[0]), (0, mo_e[0] - 2.0),
                 (nocc - 1, mo_e[nocc - 1]), (nocc, mo_e[nocc])]:
        s_cd = gw_cd._sigma_cd_point(Wiw, wts, mo_e, nocc, Lmo, p, w,
                                     ef, 1e-4, freqs).real
        s_ex = gw_exact.exact_sigma(w, mo_e, nocc, omega_v, tdm, p,
                                    eta=1e-6).real
        assert abs(s_cd - s_ex) < 1e-7

    out = gw_cd.gw_cd_gamma(sys_, res, xc="lda,vwn", nw=200, Lmo=Lmo,
                            eta=1e-4)
    qp_ex, conv = gw_exact.gw_exact_gamma(sys_, res, xc="lda,vwn",
                                          Lmo=Lmo)
    assert out.converged and conv
    assert np.abs(out.qp_energy - qp_ex).max() < 1e-4


def test_frontend_gw_cd():
    import pyscf_isdf_tpu as pit

    cell = diamond_primitive(mesh=(12, 12, 12))
    mf = pit.RKS(cell, xc="lda,vwn")
    mf.run()
    out_cd = pit.GW(mf, method="cd", orbs=[0, 1, 2, 3, 4])
    out_ac = pit.GW(mf, orbs=[0, 1, 2, 3, 4])
    assert out_cd.converged
    # AC and CD agree for frontier states (both production paths)
    assert np.abs(out_cd.qp_energy[:5] - out_ac.qp_energy[:5]).max() < 1e-3


def test_kgw_cd_gamma_limit(lda12):
    """1x1x1 k-mesh GW-CD == Gamma GW-CD (complex per-q machinery vs
    the real Gamma path), including a DEEP-CORE orbital — the regime CD
    exists for."""
    from pyscf_isdf_tpu.gw import gw_cd

    cell, sys_g, res_g, Lmo = lda12
    out_g = gw_cd.gw_cd_gamma(sys_g, res_g, xc="lda,vwn", Lmo=Lmo)
    sys_k = build_kscf_system(cell, np.zeros((1, 3)))
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    out_k = gw_cd.kgw_cd(sys_k, res_k, xc="lda,vwn")
    assert out_k.converged
    assert np.abs(out_g.qp_energy - out_k.qp_energy[0]).max() < 1e-6


@pytest.mark.heavy
def test_kgw_cd_supercell_and_ac_consistency():
    """2x1x1 KGW-CD: (a) the deepest core QP level matches the Gamma
    supercell GW-CD (band-edge representation shared by both), and
    (b) frontier states agree with KGW-AC (both production paths, same
    W — only the frequency treatment differs)."""
    from pyscf_isdf_tpu.gw import gw_cd

    mesh = (12, 12, 12)
    cell = diamond_primitive(mesh=mesh)
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    sys_k = build_kscf_system(cell, kpts)
    res_k = kscf_kernel(sys_k, xc="lda,vwn")
    nmo = np.asarray(res_k["mo_energy"]).shape[1]
    nocc = sys_k.nelec_tot // (2 * len(kpts))
    out_cd = gw_cd.kgw_cd(sys_k, res_k, xc="lda,vwn",
                          orbs=[0, nocc - 1, nocc])
    out_ac = krgw.kgw_ac(sys_k, res_k, xc="lda,vwn")
    assert out_cd.converged
    # (b) frontier consistency CD vs AC at every k-point
    for p in (nocc - 1, nocc):
        assert np.abs(out_cd.qp_energy[:, p]
                      - out_ac.qp_energy[:, p]).max() < 1e-3

    # (a) deep-core supercell parity
    sc = diamond_supercell(nrep=(2, 1, 1), mesh=(24, 12, 12))
    sys_s = build_scf_system(sc)
    res_s = scf_kernel(sys_s, xc="lda,vwn")
    from pyscf_isdf_tpu.gw.gw_cd import gw_cd_gamma
    out_s = gw_cd_gamma(sys_s, res_s, xc="lda,vwn", orbs=[0, 1])
    core_k = out_cd.qp_energy[:, 0].min()
    core_s = out_s.qp_energy[0]
    assert abs(core_k - core_s) < 2e-3
