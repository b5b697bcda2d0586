"""Contour-deformation G0W0 (Gamma point): production deep-core QP path.

Reference contract: /root/reference/pyscf/gw/gw_cd.py and the k-point
production code /root/reference/pyscf/pbc/gw/krgw_cd.py (Zhu & Chan,
JCTC 17, 727 (2021)): analytic continuation (gw/rgw.py) is accurate for
frontier states but unreliable for deep cores — the Pade fit of
Sigma(iw) cannot resolve pole structure far below the Fermi level.  CD
evaluates Sigma_c at REAL frequency exactly (up to quadrature + eta):

    Sigma_c(n, w) = I(n, w) + R(n, w)

    I(n, w) = -(1/pi) sum_m int_0^inf dw' W_mn(iw')
              * (w - e_m) / ((w - e_m)^2 + w'^2)
    R(n, w) = sum_m s_m W_mn(|w - e_m| + i eta),
              s_m = +1 for ef < e_m < w, -1 for w < e_m < ef, else 0

(the deformed-contour identity: the Gauss-Legendre imaginary-axis
integral I reuses the SAME batched W(iw') program as GW-AC, and the
residue term R needs W at a handful of real frequencies - one per
mean-field pole crossed between w and the Fermi level.)

TPU-native shape: all real-frequency W solves for a Newton step are
stacked into ONE batched polarizability GEMM + batched linear solve —
the polarizability at any complex z is the same contraction with
f_z = e_ia / (e_ia^2 - z^2) (z = iw' recovers the imaginary-axis f).
Host float64 keeps only the scalar Newton updates.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.gw.rgw import (GWResult, _mf_potentials, build_lmo,
                                   scaled_legendre)


@partial(jax.jit, static_argnames=("nocc",))
def _w_batched_z(Lmo, mo_energy, nocc, z2):
    """W_mn(z_j) = sum_PQ L_Pmn [(1 - Pi(z_j))^-1 - 1]_PQ L_Qmn for a
    batch of COMPLEX squared frequencies z2[j] = z_j^2.

    Pi(z) = 4 sum_ia L_Pia L_Qia * e_ia / (e_ia^2 - z^2)  (closed-shell
    spin factor 4, Gamma point; z = iw' gives the GW-AC kernel)."""
    naux, nmo, _ = Lmo.shape
    e = mo_energy
    eia = (e[:nocc, None] - e[None, nocc:]).reshape(-1)      # < 0
    Lov = Lmo[:, :nocc, nocc:].reshape(naux, -1)

    f = eia[None, :] / (eia[None, :] ** 2 - z2[:, None])     # (nz, nov)
    Lf = Lov[None, :, :].astype(f.dtype) * f[:, None, :]
    Pi = 4.0 * jnp.einsum("wPx,Qx->wPQ", Lf, Lov.astype(f.dtype))

    eye = jnp.eye(naux, dtype=Pi.dtype)
    eps_inv = jnp.linalg.solve(eye[None] - Pi, jnp.broadcast_to(
        eye, Pi.shape))
    eps_m1 = eps_inv - eye[None]
    Lc = Lmo.astype(Pi.dtype)
    return jnp.einsum("Pmn,wPQ,Qmn->wmn", Lc, eps_m1, Lc)


def _sigma_cd_point(Wiw, wts, mo_energy, nocc, Lmo, n, omega, ef,
                    eta, freqs):
    """Sigma_c(n, omega) by contour deformation (host f64 assembly)."""
    e = np.asarray(mo_energy, np.float64)
    # ---- imaginary-axis integral (W(iw') precomputed, all m summed)
    dm_ = omega - e                                         # (nmo,)
    kern = dm_[None, :] / (dm_[None, :] ** 2
                           + (np.asarray(freqs) ** 2)[:, None] + eta**2)
    Wn = np.asarray(Wiw[:, :, n])                           # (nw, nmo)
    integ = -np.einsum("w,wm,wm->", np.asarray(wts), Wn.real, kern) / np.pi

    # ---- residues: poles of G crossed by the contour deformation
    if omega >= ef:
        sel = np.nonzero((e > ef) & (e < omega))[0]
        sign = 1.0
    else:
        sel = np.nonzero((e < ef) & (e > omega))[0]
        sign = -1.0
    res = 0.0 + 0.0j
    if sel.size:
        z = np.abs(omega - e[sel]) + 1j * eta
        Wr = np.asarray(_w_batched_z(Lmo, jnp.asarray(e), nocc,
                                     jnp.asarray(z * z)))
        res = sign * Wr[:, sel, n].diagonal().sum()
    return integ + res


def gw_cd_gamma(system, res, xc: Optional[str] = None, nw: int = 100,
                orbs=None, eta: float = 5e-3,
                Lmo: Optional[jnp.ndarray] = None,
                max_iter: int = 50, conv_tol: float = 1e-6) -> GWResult:
    """G0W0-CD quasiparticle energies on a converged Gamma SCF result.

    Same inputs/outputs as rgw.gw_ac_gamma, but Sigma_c is evaluated at
    real frequency by contour deformation — reliable for DEEP CORE
    levels where the Pade continuation breaks down (reference
    gw_cd.py / krgw_cd.py role).  ``eta``: residue-pole broadening
    (reference default 5e-3)."""
    mo_energy = np.asarray(res["mo_energy"], np.float64)
    nmo = mo_energy.shape[0]
    nocc = system.nelec // 2
    if orbs is None:
        orbs = np.arange(nmo)
    orbs = np.asarray(orbs)

    homo, lumo = mo_energy[nocc - 1], mo_energy[nocc]
    if lumo - homo < 1e-3:
        raise ValueError("GW-CD does not support metallic references")
    ef = 0.5 * (homo + lumo)

    vx_mo, v_mf_mo = _mf_potentials(system, res, xc)
    if Lmo is None:
        Lmo = build_lmo(system, res["mo_coeff"])

    freqs, wts = scaled_legendre(nw)
    # imaginary-axis W(iw'): one batched build shared by every orbital
    Wiw = np.asarray(_w_batched_z(Lmo, jnp.asarray(mo_energy), nocc,
                                  jnp.asarray(-freqs**2 + 0j)))

    qp = mo_energy.copy()
    conv = True
    de_num = 1e-4
    for p in orbs:
        w = mo_energy[p]
        ok = False
        for _ in range(max_iter):
            s0 = _sigma_cd_point(Wiw, wts, mo_energy, nocc, Lmo, p, w,
                                 ef, eta, freqs).real
            f0 = w - mo_energy[p] - (s0 + vx_mo[p] - v_mf_mo[p])
            if abs(f0) < conv_tol:
                ok = True
                break
            s1 = _sigma_cd_point(Wiw, wts, mo_energy, nocc, Lmo, p,
                                 w + de_num, ef, eta, freqs).real
            dsdw = (s1 - s0) / de_num
            denom = 1.0 - dsdw
            if abs(denom) < 1e-3:
                denom = np.sign(denom) * 1e-3 if denom != 0 else 1e-3
            w = w - f0 / denom
        qp[p] = w
        conv = conv and ok
    return GWResult(qp_energy=qp, mo_energy=mo_energy, sigma_x=vx_mo,
                    v_mf=v_mf_mo, converged=conv, orbs=orbs, nocc=nocc)
