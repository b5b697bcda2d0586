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


# ------------------------------------------------------------- k-point CD
@partial(jax.jit, static_argnames=("nk",))
def _w_kl_z(L_stack, Lw, e_i, e_a, z2, nk):
    """W_mn(z_j) for ONE momentum transfer kL and ONE self-energy
    k-point kn, at a batch of complex squared frequencies z2.

    Pi(z) = (4/nk) sum_{k,ia} L_Pia e_ia/(e_ia^2 - z^2) conj(L_Qia)
    (z = iw' reduces to krgw._pi_kl's imaginary-axis kernel) and
    W_mn = (1/nk) sum_PQ conj(Lw_Pmn) [(1-Pi)^-1 - 1]_PQ Lw_Qmn with
    Lw = Lmo[km][kn], m at km = kn + kL (reference krgw_cd.py contract,
    Zhu & Chan JCTC 17, 727 (2021))."""
    naux = L_stack.shape[1]
    Lov = L_stack.reshape(nk, naux, -1)
    eia = (e_i[:, :, None] - e_a[:, None, :]).reshape(nk, -1)   # < 0
    f = eia[None] / (eia[None] ** 2 - z2[:, None, None])        # (nz,nk,nov)
    Lc = Lov.astype(f.dtype)
    Pi = (4.0 / nk) * jnp.einsum("kPx,wkx,kQx->wPQ", Lc, f, Lc.conj())
    eye = jnp.eye(naux, dtype=Pi.dtype)
    eps_m1 = jnp.linalg.solve(eye[None] - Pi,
                              jnp.broadcast_to(eye, Pi.shape)) - eye[None]
    Lwc = Lw.astype(Pi.dtype)
    return (1.0 / nk) * jnp.einsum("Pmq,wPQ,Qmq->wmq",
                                   Lwc.conj(), eps_m1, Lwc)


def kgw_cd(system, res, xc: Optional[str] = None, nw: int = 100,
           orbs=None, kptlist=None, eta: float = 5e-3, Lmo=None,
           max_iter: int = 50, conv_tol: float = 1e-6):
    """Contour-deformation G0W0 on a converged k-point SCF result —
    the production deep-core QP path for solids (reference
    pyscf/pbc/gw/krgw_cd.py).  Same inputs as krgw.kgw_ac; Sigma_c is
    evaluated at REAL frequency per (k, orbital):

        Sigma_c(n,kn; w) = sum_kL [ I_kL(n, w) + R_kL(n, w) ]

    with the imaginary-axis integral I reusing the SAME batched
    per-transfer screened interaction as kgw_ac, and the residue term R
    solving W at one real frequency per mean-field pole crossed between
    w and the Fermi level (m runs over bands at km = kn + kL).  No q->0
    head/wing correction here — deep-core sigma is dominated by
    short-range screening; use kgw_ac(fc=True) for frontier states.
    """
    from pyscf_isdf_tpu.gw.krgw import (KGWResult, _k_index_table,
                                        _mf_potentials_kpts,
                                        build_lmo_kpts, _pi_kl)

    mo_energy = np.asarray(res["mo_energy"], np.float64)
    nk, nmo = mo_energy.shape
    if system.nelec_tot % (2 * nk):
        raise ValueError("k-GW needs a uniform integer band filling")
    nocc = system.nelec_tot // (2 * nk)
    if orbs is None:
        orbs = np.arange(nmo)
    if kptlist is None:
        kptlist = list(range(nk))
    orbs = np.asarray(orbs)

    homo = mo_energy[:, nocc - 1].max()
    lumo = mo_energy[:, nocc].min()
    if lumo - homo < 1e-3:
        raise ValueError("GW-CD does not support metallic references")
    ef = 0.5 * (homo + lumo)

    if Lmo is None:
        Lmo = build_lmo_kpts(system, res["mo_coeff"])

    freqs, wts = scaled_legendre(nw)
    fj = jnp.asarray(freqs)
    ktab = _k_index_table(system.kpts, system.cell.a)

    # per-transfer statics + the shared imaginary-axis W(iw') for the
    # requested orbital columns: Wiw[kL][w, j, m, o]
    nj, no = len(kptlist), len(orbs)
    Wiw = np.zeros((nk, nw, nj, nmo, no))
    kl_data = []
    for kL in range(nk):
        kidx = ktab[:, kL]
        L_stack = jnp.stack([Lmo[i][kidx[i]][:, :nocc, nocc:]
                             for i in range(nk)])
        km_of = np.array([int(np.nonzero(kidx == kn)[0][0])
                          for kn in kptlist])
        Lw_js = [Lmo[km_of[j]][kptlist[j]][:, :, orbs] for j in range(nj)]
        e_i = jnp.asarray(mo_energy[:, :nocc])
        e_a = jnp.asarray(mo_energy[kidx, nocc:])

        Pi = _pi_kl(L_stack, e_i, e_a, fj, nk)
        naux = Pi.shape[1]
        eye = jnp.eye(naux, dtype=Pi.dtype)
        eps_m1 = jnp.linalg.solve(
            eye[None] - Pi, jnp.broadcast_to(eye, Pi.shape)) - eye[None]
        for j in range(nj):
            Lw = Lw_js[j].astype(eps_m1.dtype)
            Wiw[kL, :, j] = np.asarray(jnp.einsum(
                "Pmq,wPQ,Qmq->wmq", Lw.conj(), eps_m1,
                Lw).real) / nk          # same 1/nk as _w_kl_z / AC
        kl_data.append((L_stack, Lw_js, e_i, e_a, km_of))

    def sigma_cd(j, io, omega):
        """Sigma_c(orbs[io], kptlist[j]; omega), host f64 assembly."""
        val = 0.0 + 0.0j
        for kL in range(nk):
            L_stack, Lw_js, e_i, e_a, km_of = kl_data[kL]
            e_m = mo_energy[km_of[j]]
            dm_ = omega - e_m                                  # (nmo,)
            kern = dm_[None, :] / (dm_[None, :] ** 2
                                   + (freqs ** 2)[:, None] + eta ** 2)
            val += -np.einsum("w,wm,wm->", wts, Wiw[kL, :, j, :, io],
                              kern) / np.pi
            if omega >= ef:
                sel = np.nonzero((e_m > ef) & (e_m < omega))[0]
                sign = 1.0
            else:
                sel = np.nonzero((e_m < ef) & (e_m > omega))[0]
                sign = -1.0
            if sel.size:
                z = np.abs(omega - e_m[sel]) + 1j * eta
                Wr = np.asarray(_w_kl_z(L_stack, Lw_js[j][:, sel, :],
                                        e_i, e_a, jnp.asarray(z * z), nk))
                val += sign * Wr[:, :, io].diagonal().sum()
        return val

    vx_mo, v_mf_mo = _mf_potentials_kpts(system, res, xc)

    qp = mo_energy.copy()
    conv = True
    de_num = 1e-4
    for j, kn in enumerate(kptlist):
        for io, p in enumerate(orbs):
            w = mo_energy[kn, p]
            ok = False
            for _ in range(max_iter):
                s0 = sigma_cd(j, io, w).real
                f0 = w - mo_energy[kn, p] - (s0 + vx_mo[kn, p]
                                             - v_mf_mo[kn, p])
                if abs(f0) < conv_tol:
                    ok = True
                    break
                s1 = sigma_cd(j, io, w + de_num).real
                dsdw = (s1 - s0) / de_num
                denom = 1.0 - dsdw
                if abs(denom) < 1e-3:
                    denom = np.sign(denom) * 1e-3 if denom != 0 else 1e-3
                w = w - f0 / denom
            qp[kn, p] = w
            conv = conv and ok
    return KGWResult(qp_energy=qp, mo_energy=mo_energy, sigma_x=vx_mo,
                     v_mf=v_mf_mo, converged=conv, nocc=nocc)
