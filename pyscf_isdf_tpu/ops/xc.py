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


# ----------------------------------------------------------------- PBE pieces
def _ex_pbe(rho, sigma):
    """PBE exchange energy per particle (PRL 77, 3865)."""
    kappa, mu = 0.804, 0.2195149727645171
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


def _ec_pbe(rho, sigma):
    """PBE correlation energy per particle (closed shell)."""
    beta, gamma = 0.06672455060314922, 0.031090690869654895
    ec0 = _ec_pw92(rho)
    kf = (3 * jnp.pi**2 * rho) ** (1.0 / 3)
    ks = jnp.sqrt(4 * kf / jnp.pi)
    t2 = sigma / (4 * ks**2 * rho**2 + _TINY)
    expm = jnp.exp(-ec0 / gamma)
    Afac = beta / gamma / (expm - 1 + _TINY)
    num = 1 + Afac * t2
    H = gamma * jnp.log(1 + beta / gamma * t2 * num / (num + Afac**2 * t2 * t2))
    return ec0 + H


# --------------------------------------------------------------- public specs
class XCSpec:
    """Resolved functional: type ('lda'|'gga'), hybrid exact-exchange weight,
    and the energy-per-particle function exc(rho[, sigma])."""

    def __init__(self, name: str):
        name = name.lower().replace(" ", "")
        self.name = name
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
        elif name == "pbe0":
            self.family = "gga"
            self.hyb = 0.25
            self._exc = lambda rho, sigma: (
                0.75 * _ex_pbe(rho, sigma) + _ec_pbe(rho, sigma)
            )
        elif name in ("hf", "hartree-fock"):
            self.family = "hf"
            self.hyb = 1.0
            self._exc = None
        else:
            raise NotImplementedError(f"xc functional {name!r}")

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
