"""Spin-unrestricted G0W0-AC (Gamma point).

Reference contract: /root/reference/pyscf/gw/ugw_ac.py (molecular) and
pyscf/pbc/gw/kugw_ac.py — the spin-polarized member of the GW family.
The density response sums both spin channels with unit occupancy,
Pi = 2 (Pi_a + Pi_b) (ugw_ac.py:172-187); each spin's self-energy uses
its own W-side tensors, Green's-function poles and Fermi level, while
the screening W is shared.

Same TPU-native shape as gw/rgw.py: all quadrature frequencies batched
into stacked GEMMs, Pade + Newton on host f64.  Fock conventions follow
scf/uhf.py: veff_s = vj(total) + vxc_s - k_scale (vk_s + madelung
S dm_s S), so vx_s = -(vk_s + madelung S dm_s S) and GW@UHF cancels the
exchange exactly.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.scf.uhf import _spin_vxc
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft
from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.gw.rgw import (
    scaled_legendre, thiele_coefficients, pade_eval, _pade_fit_points,
    build_lmo)


@dataclass
class UGWResult:
    qp_energy: tuple          # (qp_a (nmo,), qp_b (nmo,))
    mo_energy: tuple
    sigma_x: tuple
    v_mf: tuple
    converged: bool
    nocc: tuple


@partial(jax.jit, static_argnames=("nocc_a", "nocc_b"))
def _usigma_iw(La, Lb, ea, eb, nocc_a, nocc_b, freqs, wts, omega_grid,
               ef):
    """Both spins' diagonal Sigma_c(i w'), frequencies batched.

    Returns (sigma_a, sigma_b) each (nmo, nw_sigma) complex."""
    naux = La.shape[0]

    def lov_f(L, e, no):
        eia = (e[:no, None] - e[None, no:]).reshape(-1)
        Lov = L[:, :no, no:].reshape(naux, -1)
        f = eia[None, :] / (freqs[:, None] ** 2 + eia[None, :] ** 2)
        return Lov, f

    Lov_a, fa = lov_f(La, ea, nocc_a)
    Lov_b, fb = lov_f(Lb, eb, nocc_b)
    Pi = 2.0 * (jnp.einsum("wx,Px,Qx->wPQ", fa, Lov_a, Lov_a)
                + jnp.einsum("wx,Px,Qx->wPQ", fb, Lov_b, Lov_b))
    eye = jnp.eye(naux, dtype=Pi.dtype)
    eps_inv = jnp.linalg.solve(eye[None] - Pi, jnp.broadcast_to(
        eye, Pi.shape))
    eps_m1 = eps_inv - eye[None]

    def sigma_spin(L, e, no):
        Wmn = jnp.einsum("Pmn,wPQ,Qmn->wmn", L, eps_m1, L)
        emo_occ = -1j * omega_grid[None, :] + ef - e[:, None]
        emo_vir = +1j * omega_grid[None, :] + ef - e[:, None]
        g0_occ = emo_occ[None] / (emo_occ[None] ** 2
                                  + (freqs ** 2)[:, None, None])
        g0_vir = emo_vir[None] / (emo_vir[None] ** 2
                                  + (freqs ** 2)[:, None, None])
        wc = wts.astype(Wmn.dtype)
        so = -jnp.einsum("w,wmn,wmu->nu", wc, Wmn.astype(g0_occ.dtype),
                         g0_occ) / jnp.pi
        sv = -jnp.einsum("w,wmn,wmu->nu", wc, Wmn.astype(g0_vir.dtype),
                         g0_vir) / jnp.pi
        sel = (jnp.arange(e.shape[0]) < no)[:, None]
        return jnp.where(sel, so, sv)

    return sigma_spin(La, ea, nocc_a), sigma_spin(Lb, eb, nocc_b)


def _umf_potentials(system, res, xc: Optional[str]):
    aoR = system.aoR
    mesh, weight = system.mesh, system.weight
    dm = np.asarray(res["dm"])                    # (2, nao, nao)
    C = [np.asarray(c) for c in res["mo_coeff"]]
    S = system.S
    coulG = jnp.asarray(system.coulG)

    vx, v_mf = [], []
    vxc_ab = None
    if xc is not None:
        spec = XCSpec(xc)
        if spec.omega != 0.0:
            raise NotImplementedError("UGW on RSH: todo")
        ao_grad = None
        if spec.family in ("gga", "mgga"):
            ao_grad = ao_gradient_fft(aoR, mesh,
                                      jnp.asarray(system.Gv, aoR.dtype))
        _, vxc_a, vxc_b = _spin_vxc(aoR, ao_grad,
                                    jnp.asarray(dm[0], aoR.dtype),
                                    jnp.asarray(dm[1], aoR.dtype),
                                    weight, spec)
        vxc_ab = (np.asarray(vxc_a, np.float64),
                  np.asarray(vxc_b, np.float64))
    for s in range(2):
        vk = np.asarray(fftdf.get_k(aoR, jnp.asarray(dm[s], aoR.dtype),
                                    coulG, mesh, weight), np.float64)
        vx_ao = -(vk + system.madelung * (S @ dm[s] @ S))
        if xc is None:
            v_ao = vx_ao
        else:
            spec = XCSpec(xc)
            v_ao = vxc_ab[s] + spec.hyb * vx_ao
        vx.append(np.einsum("ip,ij,jp->p", C[s], vx_ao, C[s]))
        v_mf.append(np.einsum("ip,ij,jp->p", C[s], v_ao, C[s]))
    return vx, v_mf


def ugw_ac_gamma(system, res, xc: Optional[str] = None, nw: int = 100,
                 orbs=None, nelec: Optional[tuple] = None) -> UGWResult:
    """Spin-unrestricted G0W0-AC on a converged uhf_kernel result."""
    from scipy.optimize import newton

    e_a = np.asarray(res["mo_energy"][0], np.float64)
    e_b = np.asarray(res["mo_energy"][1], np.float64)
    nmo = e_a.shape[0]
    if nelec is None:
        spin = system.cell.spin
        na = (system.nelec + spin) // 2
        nelec = (na, system.nelec - na)
    nocc_a, nocc_b = nelec
    if orbs is None:
        orbs = np.arange(nmo)

    homo = max(e_a[nocc_a - 1], e_b[nocc_b - 1] if nocc_b else -np.inf)
    lumo = min(e_a[nocc_a], e_b[nocc_b])
    if lumo - homo < 1e-3:
        raise ValueError("GW-AC does not support metallic references")
    ef = 0.5 * (homo + lumo)

    La = build_lmo(system, res["mo_coeff"][0])
    Lb = build_lmo(system, res["mo_coeff"][1])

    freqs, wts = scaled_legendre(nw)
    nw_sigma = int(np.sum(freqs < 5.0)) + 1
    omega_grid = np.zeros(nw_sigma)
    omega_grid[1:] = freqs[: nw_sigma - 1]

    sig_a, sig_b = _usigma_iw(
        La, Lb, jnp.asarray(e_a), jnp.asarray(e_b), nocc_a, nocc_b,
        jnp.asarray(freqs), jnp.asarray(wts), jnp.asarray(omega_grid), ef)

    vx, v_mf = _umf_potentials(system, res, xc)

    fit = _pade_fit_points(nw_sigma)
    qp = (e_a.copy(), e_b.copy())
    conv = True
    for s, (sig, e, no) in enumerate(
            ((np.asarray(sig_a), e_a, nocc_a),
             (np.asarray(sig_b), e_b, nocc_b))):
        for p in orbs:
            sgn = -1.0 if p < no else 1.0
            zn = 1j * sgn * omega_grid[fit]
            a = thiele_coefficients(sig[p, fit], zn)

            def s_real(w, zn=zn, a=a):
                return pade_eval(w - ef, zn, a).real

            def qp_eq(w, s=s, p=p, e=e, s_real=s_real):
                return w - e[p] - (s_real(w) + vx[s][p] - v_mf[s][p])

            try:
                qp[s][p] = newton(qp_eq, e[p], tol=1e-6, maxiter=100)
            except RuntimeError:
                conv = False
    return UGWResult(qp_energy=qp, mo_energy=(e_a, e_b),
                     sigma_x=tuple(vx), v_mf=tuple(v_mf),
                     converged=conv, nocc=(nocc_a, nocc_b))
