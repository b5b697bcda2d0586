"""Exchange-correlation functionals in pure JAX (closed-shell).

Implements the functionals the framework's configs need at formula level
(validated against libxc-backed reference energies in the test suite):

  * LDA exchange (Slater/Dirac),
  * VWN5 correlation (the reference's 'lda,vwn' default,
    pyscf/dft/libxc.py name mapping),
  * PBE exchange + correlation (PBE0 = 0.25 exact + 0.75 PBE x, full PBE c).

Energy densities are written once; potentials (vrho, vsigma) come from JAX
autodiff of the energy per volume — exact derivatives, no hand-coded
potential formulas to get wrong. Everything runs on device inside the jitted
SCF step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-30


# ----------------------------------------------------------------- LDA pieces
def _ex_slater(rho):
    """Slater exchange energy per particle."""
    return -0.75 * (3.0 / jnp.pi) ** (1.0 / 3) * rho ** (1.0 / 3)


_VWN5 = dict(A=0.0310907, b=3.72744, c=12.9352, x0=-0.10498)


def _ec_vwn5(rho):
    """VWN5 paramagnetic correlation energy per particle."""
    A, b, c, x0 = _VWN5["A"], _VWN5["b"], _VWN5["c"], _VWN5["x0"]
    rs = (3.0 / (4 * jnp.pi * rho)) ** (1.0 / 3)
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = jnp.sqrt(4 * c - b * b)
    atn = jnp.arctan(Q / (2 * x + b))
    return A * (
        jnp.log(x * x / X)
        + 2 * b / Q * atn
        - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X) + 2 * (b + 2 * x0) / Q * atn)
    )


# ------------------------------------------------------------ B88 / LYP
_B88_BETA = 0.0042
_B88_C = 1.5 * (3.0 / (4 * jnp.pi)) ** (1.0 / 3)     # spin-channel LDA_x


def _ex_b88_channel(n, s):
    """B88 exchange energy DENSITY of one spin channel (Becke, PRA 38,
    3098 (1988)): -n^{4/3} [C + beta x^2/(1 + 6 beta x asinh x)],
    x = sqrt(s)/n^{4/3}."""
    n43 = n ** (4.0 / 3)
    x = jnp.sqrt(s) / (n43 + _TINY)
    g = _B88_C + _B88_BETA * x * x \
        / (1 + 6 * _B88_BETA * x * jnp.arcsinh(x))
    return -n43 * g


def _ex_b88(rho, sigma):
    """Closed-shell B88 exchange per particle (spin-scaled channels)."""
    return 2.0 * _ex_b88_channel(0.5 * rho, 0.25 * sigma) / (rho + _TINY)


_LYP_A, _LYP_B, _LYP_C, _LYP_D = 0.04918, 0.132, 0.2533, 0.349
_CF = 0.3 * (3 * jnp.pi**2) ** (2.0 / 3)


def _ec_lyp_spin(ra, rb, saa, sab, sbb):
    """LYP correlation per particle of the total density, spin-resolved
    (Lee-Yang-Parr PRB 37, 785 (1988) in the Miehlich et al.,
    CPL 157, 200 (1989) laplacian-free reformulation)."""
    a, b, c, d = _LYP_A, _LYP_B, _LYP_C, _LYP_D
    rho = ra + rb
    st = saa + 2 * sab + sbb                    # |grad rho|^2
    r13 = (rho + _TINY) ** (-1.0 / 3)
    denom = 1 + d * r13
    omega = jnp.exp(-c * r13) / denom * (rho + _TINY) ** (-11.0 / 3)
    delta = c * r13 + d * r13 / denom
    e1 = -4 * a * ra * rb / (rho * denom + _TINY)
    inner = (2 ** (11.0 / 3) * _CF * (ra ** (8.0 / 3) + rb ** (8.0 / 3))
             + (47.0 / 18 - 7.0 * delta / 18) * st
             - (2.5 - delta / 18) * (saa + sbb)
             - (delta - 11.0) / 9 * (ra * saa + rb * sbb) / (rho + _TINY))
    e2 = -a * b * omega * (
        ra * rb * inner
        - 2.0 / 3 * rho**2 * st
        + (2.0 / 3 * rho**2 - ra**2) * sbb
        + (2.0 / 3 * rho**2 - rb**2) * saa)
    return (e1 + e2) / (rho + _TINY)


def _ec_lyp(rho, sigma):
    """Closed-shell LYP correlation per particle."""
    return _ec_lyp_spin(0.5 * rho, 0.5 * rho, 0.25 * sigma, 0.25 * sigma,
                        0.25 * sigma)


# VWN-RPA (VWN III) parameters — the correlation B3LYP historically mixes
_VWN3 = dict(A=0.0310907, b=13.0720, c=42.7198, x0=-0.409286)


# ----------------------------------------------------------------- PBE pieces
def _ex_pbe(rho, sigma, mu=0.2195149727645171):
    """PBE exchange energy per particle (PRL 77, 3865). ``mu=10/81``
    (the GE2 value) gives the PBEsol exchange (PRL 100, 136406)."""
    kappa = 0.804
    kf = (3 * jnp.pi**2 * rho) ** (1.0 / 3)
    s2 = sigma / (4 * kf**2 * rho**2 + _TINY)
    fx = 1 + kappa - kappa / (1 + mu * s2 / kappa)
    return _ex_slater(rho) * fx


def _ec_pw92(rho):
    """PW92 paramagnetic correlation (basis of PBE correlation)."""
    A, a1 = 0.031091, 0.21370
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    rs = (3.0 / (4 * jnp.pi * rho)) ** (1.0 / 3)
    srs = jnp.sqrt(rs)
    den = 2 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    return -2 * A * (1 + a1 * rs) * jnp.log(1 + 1.0 / (den + _TINY))


def _ec_pbe(rho, sigma, beta=0.06672455060314922):
    """PBE correlation energy per particle (closed shell).
    ``beta=0.046`` (jellium-surface fit) gives PBEsol correlation."""
    gamma = 0.031090690869654895
    ec0 = _ec_pw92(rho)
    kf = (3 * jnp.pi**2 * rho) ** (1.0 / 3)
    ks = jnp.sqrt(4 * kf / jnp.pi)
    t2 = sigma / (4 * ks**2 * rho**2 + _TINY)
    expm = jnp.exp(-ec0 / gamma)
    Afac = beta / gamma / (expm - 1 + _TINY)
    num = 1 + Afac * t2
    H = gamma * jnp.log(1 + beta / gamma * t2 * num / (num + Afac**2 * t2 * t2))
    return ec0 + H


# ------------------------------------------------ range-separated exchange
def _sr_lda_factor(a):
    """Exact erfc(w r)/r attenuation of the UEG exchange energy.

    a = w / (2 kF). Closed form of the UEG exchange-hole integral against
    the short-range kernel (Gill & Adamson CPL 261, 105 (1996); used by
    the HSE construction, JCP 118, 8207 (2003)) — validated in
    tests/test_rsh.py against direct numerical integration of the exact
    hole. Series expansion below a ~ 1e-3 for autodiff stability.
    """
    a = jnp.asarray(a)
    a2 = a * a
    exp4 = jnp.exp(-1.0 / jnp.maximum(4 * a2, 1e-8))
    full = 1.0 - (8.0 / 3.0) * a * (
        jnp.sqrt(jnp.pi) * jax.scipy.special.erf(1.0 / (2 * jnp.maximum(a, 1e-12)))
        + (2 * a - 4 * a2 * a) * exp4
        - 3 * a + 4 * a2 * a
    )
    small = 1.0 - (8.0 / 3.0) * a * (jnp.sqrt(jnp.pi) - 3 * a + 4 * a2 * a)
    return jnp.where(a < 1e-3, small, full)


def _fx_pbe(s2):
    """PBE exchange enhancement factor F(s^2)."""
    kappa, mu = 0.804, 0.2195149727645171
    return 1 + kappa - kappa / (1 + mu * s2 / kappa)


def _fx_sr(s2, nu):
    """Short-range (erfc-screened) PBE exchange enhancement F(s, nu).

    Local-wavevector screening (Iikura-Tsuneda-Yanai-Hirao, JCP 115, 3540
    (2001)): the GGA energy density at reduced gradient s equals that of a
    UEG with kF_eff = kF * F_PBE(s), so the screened enhancement is

        F_SR(s, nu) = F_PBE(s) * f_srLDA( nu / (2 F_PBE(s)) ),
        nu = omega / kF.

    Exact limits by construction (pinned in tests/test_rsh.py):
      nu -> 0:  F_PBE(s)   (so hse06(omega->0) == pbe0 exactly),
      s  -> 0:  the exact UEG erfc attenuation,
      nu -> oo: 0.
    This is a published alternative to the HJS/wPBEh model holes (libxc's
    GGA_X_WPBEH); the two SR splits differ by O(1%) of the exchange
    energy at intermediate s, the same spread as HSE03-vs-HSE06 holes.
    """
    F = _fx_pbe(s2)
    return F * _sr_lda_factor(nu / (2.0 * F))


def _ex_wpbe_sr(rho, sigma, omega):
    """Short-range (erfc-screened) PBE exchange energy per particle."""
    kf = (3 * jnp.pi**2 * rho) ** (1.0 / 3)
    s2 = sigma / (4 * kf**2 * rho**2 + _TINY)
    nu = omega / kf
    return _ex_slater(rho) * _fx_sr(s2, nu)


# ------------------------------------------------------------ spin-polarized
_VWN5_F = dict(A=0.01554535, b=7.06042, c=18.0578, x0=-0.32500)
_VWN5_A = dict(A=-1.0 / (6 * jnp.pi**2), b=1.13107, c=13.0045, x0=-0.00475840)


def _vwn_eps(rho, p):
    A, b, c, x0 = p["A"], p["b"], p["c"], p["x0"]
    rs = (3.0 / (4 * jnp.pi * rho)) ** (1.0 / 3)
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = jnp.sqrt(4 * c - b * b)
    atn = jnp.arctan(Q / (2 * x + b))
    return A * (
        jnp.log(x * x / X)
        + 2 * b / Q * atn
        - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X) + 2 * (b + 2 * x0) / Q * atn)
    )


def _fzeta(z):
    return (((1 + z) ** (4.0 / 3) + (1 - z) ** (4.0 / 3)) - 2) \
        / (2 * (2 ** (1.0 / 3) - 1))


_FPP0 = 4.0 / (9 * (2 ** (1.0 / 3) - 1))  # f''(0)


def _ec_vwn_spin(rho, zeta, p_para, p_ferro, p_alpha):
    """VWN correlation with the standard zeta interpolation, for a given
    (paramagnetic, ferromagnetic, spin-stiffness) parameter triple."""
    ec_p = _vwn_eps(rho, p_para)
    ec_f = _vwn_eps(rho, p_ferro)
    alpha = _vwn_eps(rho, p_alpha)
    f = _fzeta(zeta)
    z4 = zeta**4
    return ec_p + alpha * f / _FPP0 * (1 - z4) + (ec_f - ec_p) * f * z4


def _ec_vwn5_spin(rho, zeta):
    """VWN5 correlation with the standard zeta interpolation."""
    return _ec_vwn_spin(rho, zeta, _VWN5, _VWN5_F, _VWN5_A)


# VWN-RPA ferro/stiffness parameters (libxc lda_c_vwn_rpa numbers)
_VWN3_F = dict(A=0.01554535, b=20.1231, c=101.578, x0=-0.743294)
_VWN3_A = dict(A=-1.0 / (6 * jnp.pi**2), b=1.06835, c=11.4813,
               x0=-0.228344)


def _pw92_eps(rho, A, a1, b1, b2, b3, b4):
    rs = (3.0 / (4 * jnp.pi * rho)) ** (1.0 / 3)
    srs = jnp.sqrt(rs)
    den = 2 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    return -2 * A * (1 + a1 * rs) * jnp.log(1 + 1.0 / (den + _TINY))


def _ec_pw92_spin(rho, zeta):
    ec_p = _pw92_eps(rho, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
    ec_f = _pw92_eps(rho, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
    m_ac = _pw92_eps(rho, 0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)
    f = _fzeta(zeta)
    z4 = zeta**4
    return ec_p - m_ac * f / _FPP0 * (1 - z4) + (ec_f - ec_p) * f * z4


def _exc_lsda(rho_a, rho_b, corr="vwn5"):
    """LSDA exchange + correlation energy per particle of the total density."""
    rho = rho_a + rho_b
    zeta = (rho_a - rho_b) / (rho + _TINY)
    # exchange: E_x = 1/2 [E_x(2 rho_a) + E_x(2 rho_b)]
    ex = 0.5 * (_ex_slater(2 * rho_a) * 2 * rho_a
                + _ex_slater(2 * rho_b) * 2 * rho_b) / (rho + _TINY)
    ec = _ec_vwn5_spin(rho, zeta) if corr == "vwn5" else _ec_pw92_spin(rho, zeta)
    return ex + ec


def _ec_pbe_spin(rho, zeta, sigma, beta=0.06672455060314922):
    """Spin-resolved PBE correlation (PRL 77, 3865 Eqs. 7-8)."""
    gamma = 0.031090690869654895
    phi = 0.5 * ((1 + zeta) ** (2.0 / 3) + (1 - zeta) ** (2.0 / 3))
    ec0 = _ec_pw92_spin(rho, zeta)
    kf = (3 * jnp.pi**2 * rho) ** (1.0 / 3)
    ks = jnp.sqrt(4 * kf / jnp.pi)
    t2 = sigma / (4 * phi**2 * ks**2 * rho**2 + _TINY)
    expm = jnp.exp(-ec0 / (gamma * phi**3))
    Afac = beta / gamma / (expm - 1 + _TINY)
    num = 1 + Afac * t2
    H = gamma * phi**3 * jnp.log(
        1 + beta / gamma * t2 * num / (num + Afac**2 * t2 * t2)
    )
    return ec0 + H


def _exc_pbe_spin(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb, ex_frac=1.0,
                  mu=0.2195149727645171, beta=0.06672455060314922):
    """Spin-resolved PBE(sol) exc per particle of the total density."""
    rho = rho_a + rho_b
    zeta = (rho_a - rho_b) / (rho + _TINY)
    sigma = sigma_aa + 2 * sigma_ab + sigma_bb
    ex = 0.5 * (_ex_pbe(2 * rho_a, 4 * sigma_aa, mu) * 2 * rho_a
                + _ex_pbe(2 * rho_b, 4 * sigma_bb, mu) * 2 * rho_b) \
        / (rho + _TINY)
    return ex_frac * ex + _ec_pbe_spin(rho, zeta, sigma, beta)


# --------------------------------------------------------------- public specs
class XCSpec:
    """Resolved functional: type ('lda'|'gga'), hybrid exact-exchange weight,
    and the energy-per-particle function exc(rho[, sigma]).

    Range separation follows the reference (omega, alpha, hyb) convention
    (pyscf rsh_and_hybrid_coeff, pbc/dft/rks.py:108-121):

        K_eff = alpha * K_full + (hyb - alpha) * K_SR(omega)

    with alpha == hyb (and omega == 0) for ordinary global hybrids. For
    hse06: omega=0.11, hyb=0.25, alpha=0 (pure short-range exchange — the
    SR Coulomb kernel is finite at G=0, so no ewald/madelung correction is
    needed on the SR part).
    """

    def __hash__(self):
        # value-based identity: XCSpec is a jit static argument
        # (scf/hf.py _vxc_* static_argnames); the default object-id hash
        # made EVERY scf_kernel call recompile every jitted XC program
        # (a fresh XCSpec per call), bloating the XLA program cache
        # across a long process
        return hash(("XCSpec", self.name))

    def __eq__(self, other):
        return isinstance(other, XCSpec) and other.name == self.name

    def __init__(self, name: str):
        name = name.lower().replace(" ", "")
        self.name = name
        self.omega = 0.0
        if name in ("lda", "lda,vwn", "lda,vwn5", "svwn"):
            self.family = "lda"
            self.hyb = 0.0
            self._exc = lambda rho: _ex_slater(rho) + _ec_vwn5(rho)
        elif name in ("lda,", "slater"):
            self.family = "lda"
            self.hyb = 0.0
            self._exc = _ex_slater
        elif name == "pbe":
            self.family = "gga"
            self.hyb = 0.0
            self._exc = lambda rho, sigma: _ex_pbe(rho, sigma) + _ec_pbe(rho, sigma)
        elif name == "pbesol":
            # PBE for solids (Perdew et al., PRL 100, 136406): exchange
            # mu restored to the GE2 value 10/81, correlation beta from
            # the jellium-surface fit
            self.family = "gga"
            self.hyb = 0.0
            self._exc = lambda rho, sigma: (
                _ex_pbe(rho, sigma, mu=10.0 / 81.0)
                + _ec_pbe(rho, sigma, beta=0.046)
            )
        elif name == "pbe0":
            self.family = "gga"
            self.hyb = 0.25
            self._exc = lambda rho, sigma: (
                0.75 * _ex_pbe(rho, sigma) + _ec_pbe(rho, sigma)
            )
        elif name == "blyp":
            self.family = "gga"
            self.hyb = 0.0
            self._exc = lambda rho, sigma: _ex_b88(rho, sigma) \
                + _ec_lyp(rho, sigma)
        elif name in ("b3lyp", "b3lyp5"):
            # Gaussian-convention B3: 0.8 LDA_x + 0.72 dB88 + 0.2 HF
            # == 0.08 LDA_x + 0.72 B88(full) + 0.2 HF;
            # correlation 0.19 VWN + 0.81 LYP with VWN-RPA ('b3lyp') or
            # VWN5 ('b3lyp5' — the reference's B3LYP5 naming)
            self.family = "gga"
            self.hyb = 0.2
            vwn = (_ec_vwn5 if name == "b3lyp5"
                   else (lambda rho: _vwn_eps(rho, _VWN3)))
            self._exc = lambda rho, sigma: (
                0.08 * _ex_slater(rho) + 0.72 * _ex_b88(rho, sigma)
                + 0.19 * vwn(rho) + 0.81 * _ec_lyp(rho, sigma)
            )
        elif name == "hse06":
            # E_xc = 0.25 K_SR(w) + [E_x^PBE - 0.25 E_x^{SR-PBE}(w)] + E_c^PBE
            self.family = "gga"
            self.hyb = 0.25
            self.omega = 0.11
            w = self.omega
            self._exc = lambda rho, sigma: (
                _ex_pbe(rho, sigma) - 0.25 * _ex_wpbe_sr(rho, sigma, w)
                + _ec_pbe(rho, sigma)
            )
        elif name in ("hf", "hartree-fock"):
            self.family = "hf"
            self.hyb = 1.0
            self._exc = None
        elif name in ("scan", "tpss", "r2scan"):
            # tau rung (VERDICT r2 missing #5); formulas in ops/xc_mgga.py
            from pyscf_isdf_tpu.ops import xc_mgga

            self.family = "mgga"
            self.hyb = 0.0
            self._exc = {"scan": xc_mgga.exc_scan,
                         "tpss": xc_mgga.exc_tpss,
                         "r2scan": xc_mgga.exc_r2scan}[name]
            self._exc_spin = {"scan": xc_mgga.exc_scan_spin,
                              "tpss": xc_mgga.exc_tpss_spin,
                              "r2scan": xc_mgga.exc_r2scan_spin}[name]
        else:
            raise NotImplementedError(f"xc functional {name!r}")
        self.alpha = 0.0 if name == "hse06" else self.hyb

    def exc_vxc_spin(self, rho_a, rho_b, sigma_aa=None, sigma_ab=None,
                     sigma_bb=None):
        """Spin-polarized energy density and potentials.

        LDA: returns (exc, (vrho_a, vrho_b), None).
        GGA: returns (exc, (vrho_a, vrho_b), (vs_aa, vs_ab, vs_bb)).
        ``exc`` is per particle of the total density.
        """
        rho_a = jnp.maximum(rho_a, _TINY)
        rho_b = jnp.maximum(rho_b, _TINY)
        name = self.name
        if self.family == "lda":
            corr = "vwn5" if "vwn" in name or name in ("lda", "svwn") else None
            if corr is None:
                exc_fn = lambda ra, rb: 0.5 * (
                    _ex_slater(2 * ra) * 2 * ra + _ex_slater(2 * rb) * 2 * rb
                ) / (ra + rb + _TINY)
            else:
                exc_fn = lambda ra, rb: _exc_lsda(ra, rb, corr)
            f = lambda ra, rb: (ra + rb) * exc_fn(ra, rb)
            exc = exc_fn(rho_a, rho_b)
            va = jax.vmap(jax.grad(f, argnums=0))(rho_a, rho_b)
            vb = jax.vmap(jax.grad(f, argnums=1))(rho_a, rho_b)
            return exc, (va, vb), None
        if self.family == "gga":
            ex_frac = 0.75 if name == "pbe0" else 1.0
            sigma_aa = jnp.maximum(sigma_aa, _TINY)
            sigma_ab = sigma_ab
            sigma_bb = jnp.maximum(sigma_bb, _TINY)
            if name == "hse06":
                w = self.omega

                def exc_fn(ra, rb, saa, sab, sbb):
                    rho = ra + rb
                    sr = 0.5 * (
                        _ex_wpbe_sr(2 * ra, 4 * saa, w) * 2 * ra
                        + _ex_wpbe_sr(2 * rb, 4 * sbb, w) * 2 * rb
                    ) / (rho + _TINY)
                    return _exc_pbe_spin(ra, rb, saa, sab, sbb, 1.0) \
                        - 0.25 * sr
            elif name in ("blyp", "b3lyp", "b3lyp5"):
                ax_lda = 0.0 if name == "blyp" else 0.08
                ax_b88 = 1.0 if name == "blyp" else 0.72
                ac_vwn = 0.0 if name == "blyp" else 0.19
                ac_lyp = 1.0 if name == "blyp" else 0.81
                vwn_pf = ((_VWN5, _VWN5_F, _VWN5_A) if name == "b3lyp5"
                          else (_VWN3, _VWN3_F, _VWN3_A))

                def exc_fn(ra, rb, saa, sab, sbb):
                    rho = ra + rb + _TINY
                    zeta = (ra - rb) / rho
                    ex = (_ex_b88_channel(ra, saa)
                          + _ex_b88_channel(rb, sbb)) / rho
                    e = ax_b88 * ex + ac_lyp * _ec_lyp_spin(
                        ra, rb, saa, sab, sbb)
                    if ax_lda:
                        e = e + ax_lda * 0.5 * (
                            _ex_slater(2 * ra) * 2 * ra
                            + _ex_slater(2 * rb) * 2 * rb) / rho
                    if ac_vwn:
                        e = e + ac_vwn * _ec_vwn_spin(rho, zeta, *vwn_pf)
                    return e
            elif name == "pbesol":
                exc_fn = lambda ra, rb, saa, sab, sbb: _exc_pbe_spin(
                    ra, rb, saa, sab, sbb, 1.0, mu=10.0 / 81.0, beta=0.046)
            else:
                exc_fn = lambda ra, rb, saa, sab, sbb: _exc_pbe_spin(
                    ra, rb, saa, sab, sbb, ex_frac)
            f = lambda *args: (args[0] + args[1]) * exc_fn(*args)
            args = (rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb)
            exc = exc_fn(*args)
            grads = [jax.vmap(jax.grad(f, argnums=i))(*args) for i in range(5)]
            return exc, (grads[0], grads[1]), (grads[2], grads[3], grads[4])
        raise ValueError("pure HF has no xc functional")

    def exc_vxc(self, rho, sigma=None):
        """Energy density per particle and potentials.

        Returns (exc, vrho, vsigma) with vsigma=None for LDA; derivatives of
        f = rho * exc via autodiff.
        """
        rho = jnp.maximum(rho, _TINY)
        if self.family == "lda":
            f = lambda r: r * self._exc(r)
            exc = self._exc(rho)
            vrho = jax.vmap(jax.grad(f))(rho)
            return exc, vrho, None
        if self.family == "gga":
            sigma = jnp.maximum(sigma, _TINY)
            f = lambda r, s: r * self._exc(r, s)
            exc = self._exc(rho, sigma)
            vrho = jax.vmap(jax.grad(f, argnums=0))(rho, sigma)
            vsigma = jax.vmap(jax.grad(f, argnums=1))(rho, sigma)
            return exc, vrho, vsigma
        raise ValueError("pure HF has no xc functional")

    def exc_vxc_mgga(self, rho, sigma, tau):
        """meta-GGA energy density per particle and potentials.

        Returns (exc, vrho, vsigma, vtau); derivatives of f = rho * exc
        by autodiff (same scheme as the lower rungs). The Fock-matrix
        tau term is V_tau = 1/2 w sum_x grad_x ao^T (vtau grad_x ao)
        (reference eval_xc deriv convention, pyscf/dft/libxc.py:1282).
        """
        assert self.family == "mgga"
        rho = jnp.maximum(rho, _TINY)
        sigma = jnp.maximum(sigma, _TINY)
        tau = jnp.maximum(tau, _TINY)
        f = lambda r, s, t: r * self._exc(r, s, t)
        exc = self._exc(rho, sigma, tau)
        grads = [jax.vmap(jax.grad(f, argnums=i))(rho, sigma, tau)
                 for i in range(3)]
        return exc, grads[0], grads[1], grads[2]

    def exc_vxc_mgga_spin(self, rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb,
                          tau_a, tau_b):
        """Spin-polarized meta-GGA: returns (exc, (va, vb),
        (vs_aa, vs_ab, vs_bb), (vt_a, vt_b))."""
        assert self.family == "mgga"
        args = (jnp.maximum(rho_a, _TINY), jnp.maximum(rho_b, _TINY),
                jnp.maximum(sigma_aa, _TINY), sigma_ab,
                jnp.maximum(sigma_bb, _TINY),
                jnp.maximum(tau_a, _TINY), jnp.maximum(tau_b, _TINY))
        f = lambda *a: (a[0] + a[1]) * self._exc_spin(*a)
        exc = self._exc_spin(*args)
        g = [jax.vmap(jax.grad(f, argnums=i))(*args) for i in range(7)]
        return exc, (g[0], g[1]), (g[2], g[3], g[4]), (g[5], g[6])
