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
    coulG_lr = None
    if xc is not None and XCSpec(xc).omega != 0.0:
        from pyscf_isdf_tpu.ops import coulomb

        spec = XCSpec(xc)
        coulG_lr = jnp.asarray(coulomb.get_coulG(
            system.cell, exxdiv=None, omega=spec.omega), aoR.dtype)
        mad_lr = coulomb.madelung_omega(system.cell, None, spec.omega)
    for s in range(2):
        vk = np.asarray(fftdf.get_k(aoR, jnp.asarray(dm[s], aoR.dtype),
                                    coulG, mesh, weight), np.float64)
        vx_ao = -(vk + system.madelung * (S @ dm[s] @ S))
        if xc is None:
            v_ao = vx_ao
        else:
            spec = XCSpec(xc)
            v_ao = vxc_ab[s] + spec.hyb * vx_ao
            if coulG_lr is not None:
                # RSH (scf/uhf.py semantics): hyb*K_full +
                # (alpha-hyb)*K_LR(omega), each with its own madelung
                vk_lr = np.asarray(fftdf.get_k(
                    aoR, jnp.asarray(dm[s], aoR.dtype), coulG_lr, mesh,
                    weight), np.float64)
                vx_lr = -(vk_lr + mad_lr * (S @ dm[s] @ S))
                v_ao = v_ao + (spec.alpha - spec.hyb) * vx_lr
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

    from pyscf_isdf_tpu.df import gdf as gdf_mod

    g = gdf_mod.build_gdf(system.cell, system.aoR,
                          jnp.asarray(system.coulG), system.mesh,
                          system.weight)
    La = build_lmo(system, res["mo_coeff"][0], g=g)
    Lb = build_lmo(system, res["mo_coeff"][1], g=g)

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


# ------------------------------------------------------------------
# k-point spin-unrestricted GW (reference pbc/gw/kugw_ac.py)

def kugw_ac(system, res, xc=None, nw: int = 100, orbs=None,
            nelec=None) -> UGWResult:
    """Spin-unrestricted k-point G0W0-AC on a kuhf_kernel result.

    Per momentum transfer the polarizability sums both spin channels
    with unit occupancy, Pi = 2/nk sum_s sum_ki L^s f L^s*; the shared
    screening feeds per-spin W/G contractions (kugw_ac.py structure on
    the krgw engine of gw/krgw.py).  xc support: None (KUHF) or
    LDA-family; spin k-GGA v_mf plumbing is a loud TODO.

    Closed-shell limit == restricted kgw_ac (exact oracle, tested).
    """
    from scipy.optimize import newton
    import jax

    from pyscf_isdf_tpu.df import gdf as gdf_mod
    from pyscf_isdf_tpu.df import fftdf_k
    from pyscf_isdf_tpu.gw.krgw import (
        _k_index_table, _kl_contribution, _pi_kl, build_lmo_kpts)
    from pyscf_isdf_tpu.gw.rgw import _pade_fit_points

    e_s = [np.asarray(e, np.float64) for e in res["mo_energy"]]
    nk, nmo = e_s[0].shape
    if nelec is None:
        spin = system.cell.spin
        ne_tot = system.nelec_tot
        na = (ne_tot + spin * nk) // 2        # alpha electrons, all k
        nelec = (na // nk, (ne_tot - na) // nk)
    nocc_s = list(nelec)
    if orbs is None:
        orbs = np.arange(nmo)

    homo = max(e_s[s][:, nocc_s[s] - 1].max()
               for s in range(2) if nocc_s[s] > 0)
    lumo = min(e_s[s][:, nocc_s[s]].min() for s in range(2))
    if lumo - homo < 1e-3:
        raise ValueError("GW-AC does not support metallic references")
    ef = 0.5 * (homo + lumo)

    kg = gdf_mod.build_gdf_kpts(system.cell, system.aoR_k, system.kpts,
                                system.mesh, system.weight)
    Lmo_s = [build_lmo_kpts(system, res["mo_coeff"][s], kg=kg)
             for s in range(2)]

    freqs, wts = scaled_legendre(nw)
    nw_sigma = int(np.sum(freqs < 5.0)) + 1
    omega_grid = np.zeros(nw_sigma)
    omega_grid[1:] = freqs[: nw_sigma - 1]
    fj, wj, og = (jnp.asarray(freqs), jnp.asarray(wts),
                  jnp.asarray(omega_grid))

    ktab = _k_index_table(system.kpts, system.cell.a)
    sigma = [np.zeros((nk, nmo, nw_sigma), np.complex128)
             for _ in range(2)]
    for kL in range(nk):
        kidx = ktab[:, kL]
        km_of = np.array([int(np.nonzero(kidx == kn)[0][0])
                          for kn in range(nk)])
        Pi = 0.0
        for s in range(2):
            no = nocc_s[s]
            L_stack = jnp.stack([Lmo_s[s][i][kidx[i]][:, :no, no:]
                                 for i in range(nk)])
            # _pi_kl carries the restricted factor 4/nk; each spin
            # contributes 2/nk -> halve
            Pi = Pi + 0.5 * _pi_kl(
                L_stack, jnp.asarray(e_s[s][:, :no]),
                jnp.asarray(e_s[s][kidx, no:]), fj, nk)
        naux = Pi.shape[1]
        eye = jnp.eye(naux, dtype=Pi.dtype)
        eps_inv = jnp.linalg.solve(eye[None] - Pi,
                                   jnp.broadcast_to(eye, Pi.shape))
        eps_m1 = eps_inv - eye[None]
        for s in range(2):
            Lw_stack = jnp.stack([Lmo_s[s][km_of[kn]][kn]
                                  for kn in range(nk)])
            e_m = jnp.asarray(e_s[s][km_of, :])
            sigma[s] += np.asarray(_kl_contribution(
                eps_m1, Lw_stack, e_m, fj, wj, og, ef, nocc_s[s], nk))

    # mean-field potentials per spin at k
    aoR_k = system.aoR_k
    dm = [np.asarray(d) for d in res["dm"]]
    C = [np.asarray(c) for c in res["mo_coeff"]]
    S = system.S
    vx_mo = [None, None]
    v_mf_mo = [None, None]
    vxc_s = None
    if xc is not None:
        from pyscf_isdf_tpu.scf.kuhf import vxc_spin_kpts

        spec = XCSpec(xc)
        ao_grad_k = None
        if spec.family in ("gga", "mgga"):
            from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft_k

            coords = jnp.asarray(system.cell.uniform_grid())
            Gv = jnp.asarray(system.cell.get_Gv())
            ao_grad_k = jnp.stack([
                ao_gradient_fft_k(aoR_k[k], system.mesh, Gv,
                                  jnp.asarray(system.kpts[k]), coords)
                for k in range(nk)])
        _, vxc_a, vxc_b = vxc_spin_kpts(aoR_k, ao_grad_k, dm[0], dm[1],
                                        system.weight, spec)
        vxc_s = [vxc_a, vxc_b]
    cpl = mad_lr = None
    if xc is not None and XCSpec(xc).omega != 0.0:
        from pyscf_isdf_tpu.ops import coulomb

        spec = XCSpec(xc)
        cpl, _ = fftdf_k.make_k_kernels(system.cell, system.kpts,
                                        omega=spec.omega)
        cpl = jnp.asarray(cpl)
        mad_lr = coulomb.madelung_omega(system.cell, system.kpts,
                                        spec.omega)
    for s in range(2):
        # weight = (1/nk) * vol/ngrids (df/fftdf_k.py get_k_kpts contract)
        vk = np.array(fftdf_k.get_k_kpts(
            aoR_k, jnp.asarray(dm[s], aoR_k.dtype), system.coulG_pairs,
            system.expmikr, system.mesh, system.weight / nk),
            np.complex128)
        for k in range(nk):
            vk[k] += system.madelung * (S[k] @ dm[s][k] @ S[k])
        vx_ao = -vk
        if xc is None:
            v_ao = vx_ao
        else:
            spec = XCSpec(xc)
            v_ao = vxc_s[s] + spec.hyb * vx_ao
            if cpl is not None:
                # RSH at k (scf/kuhf.py semantics): hyb*K_full +
                # (alpha-hyb)*K_LR(omega), LR madelung for the LR part
                vk_lr = np.array(fftdf_k.get_k_kpts(
                    aoR_k, jnp.asarray(dm[s], aoR_k.dtype), cpl,
                    system.expmikr, system.mesh, system.weight / nk),
                    np.complex128)
                for k in range(nk):
                    vk_lr[k] += mad_lr * (S[k] @ dm[s][k] @ S[k])
                v_ao = v_ao + (spec.alpha - spec.hyb) * (-vk_lr)
        vx_mo[s] = np.einsum("kip,kij,kjp->kp", np.conj(C[s]), vx_ao,
                             C[s]).real
        v_mf_mo[s] = np.einsum("kip,kij,kjp->kp", np.conj(C[s]), v_ao,
                               C[s]).real

    fit = _pade_fit_points(nw_sigma)
    qp = tuple(e.copy() for e in e_s)
    conv = True
    for s in range(2):
        for kn in range(nk):
            for p in orbs:
                sgn = -1.0 if p < nocc_s[s] else 1.0
                zn = 1j * sgn * omega_grid[fit]
                a = thiele_coefficients(sigma[s][kn, p, fit], zn)

                def s_real(w, zn=zn, a=a):
                    return pade_eval(w - ef, zn, a).real

                def qp_eq(w, s=s, kn=kn, p=p, s_real=s_real):
                    return w - e_s[s][kn, p] - (
                        s_real(w) + vx_mo[s][kn, p] - v_mf_mo[s][kn, p])

                try:
                    qp[s][kn, p] = newton(qp_eq, e_s[s][kn, p],
                                          tol=1e-6, maxiter=100)
                except RuntimeError:
                    conv = False
    return UGWResult(qp_energy=qp, mo_energy=tuple(e_s),
                     sigma_x=tuple(vx_mo), v_mf=tuple(v_mf_mo),
                     converged=conv, nocc=tuple(nocc_s))


# ------------------------------------------------------------------
# spin-polarized direct-RPA correlation energy

def urpa_ecorr_gamma(system, res, nw: int = 100,
                     nelec=None) -> float:
    """Unrestricted direct-RPA correlation energy (Gamma).
    (Ec depends only on the orbitals/eigenvalues, not the functional.)

    Pi(iw) = 2 sum_s L_s f_s L_s^T (unit occupancies — the ugw response
    factor), Ec = 1/(2 pi) int dw tr[ln(1 - Pi) + Pi].  Closed-shell
    limit == the restricted rpa_ecorr_gamma exactly (tested); the
    spin-orbital plasmon formula Ec = 1/2 (sum Omega - tr A) with
    A = d + K over the stacked (ia, spin) space is the dense oracle."""
    e_a = np.asarray(res["mo_energy"][0], np.float64)
    e_b = np.asarray(res["mo_energy"][1], np.float64)
    if nelec is None:
        spin = system.cell.spin
        na = (system.nelec + spin) // 2
        nelec = (na, system.nelec - na)
    nocc_a, nocc_b = nelec
    from pyscf_isdf_tpu.df import gdf as gdf_mod

    g = gdf_mod.build_gdf(system.cell, system.aoR,
                          jnp.asarray(system.coulG), system.mesh,
                          system.weight)
    La = build_lmo(system, res["mo_coeff"][0], g=g)
    Lb = build_lmo(system, res["mo_coeff"][1], g=g)
    naux = La.shape[0]

    from pyscf_isdf_tpu.gw.rgw import scaled_legendre

    freqs, wts = scaled_legendre(nw)

    def lov_f(L, e, no):
        eia = (e[:no, None] - e[None, no:]).reshape(-1)
        Lov = np.asarray(L[:, :no, no:]).reshape(naux, -1)
        f = eia[None, :] / (freqs[:, None] ** 2 + eia[None, :] ** 2)
        return Lov, f

    Lov_a, fa = lov_f(La, e_a, nocc_a)
    Lov_b, fb = lov_f(Lb, e_b, nocc_b)
    Pi = 2.0 * (jnp.einsum("wx,Px,Qx->wPQ", jnp.asarray(fa),
                           jnp.asarray(Lov_a), jnp.asarray(Lov_a))
                + jnp.einsum("wx,Px,Qx->wPQ", jnp.asarray(fb),
                             jnp.asarray(Lov_b), jnp.asarray(Lov_b)))
    ev = np.asarray(jnp.linalg.eigvalsh(Pi))
    integ = np.sum(np.log(1.0 - ev) + ev, axis=1)
    return float(np.sum(wts * integ) / (2.0 * np.pi))


def urpa_ecorr_plasmon(res, nelec, La, Lb) -> float:
    """Dense spin-orbital dRPA plasmon-formula oracle:
    A = diag(d) + K, B = K over the stacked (ia, spin) space;
    Ec = 1/2 (sum_v Omega_v - tr A)."""
    e_a = np.asarray(res["mo_energy"][0], np.float64)
    e_b = np.asarray(res["mo_energy"][1], np.float64)
    nocc_a, nocc_b = nelec
    naux = La.shape[0]
    d = np.concatenate([
        (e_a[None, nocc_a:] - e_a[:nocc_a, None]).ravel(),
        (e_b[None, nocc_b:] - e_b[:nocc_b, None]).ravel()])
    Lov = np.concatenate([
        np.asarray(La[:, :nocc_a, nocc_a:]).reshape(naux, -1),
        np.asarray(Lb[:, :nocc_b, nocc_b:]).reshape(naux, -1)], axis=1)
    K = Lov.T @ Lov
    sd = np.sqrt(d)
    C = sd[:, None] * (np.diag(d) + 2.0 * K) * sd[None, :]
    omega = np.sqrt(np.maximum(np.linalg.eigvalsh(C), 0.0))
    return float(0.5 * (omega.sum() - d.sum() - np.trace(K)))


def kurpa_ecorr(system, res, nw: int = 100, nelec=None) -> float:
    """k-point spin-unrestricted direct-RPA correlation energy PER
    UNIT CELL.

    Same per-q ln-det trace as krgw.rpa_ecorr_kpts, with the
    spin-summed polarizability of kugw_ac (each spin channel enters
    with unit occupancy, Pi_q = 2/nk sum_s sum_ki L^s f L^s*):

        Ec_cell = 1/(2 pi nk) sum_q int_0^inf dw
                  tr[ ln(1 - Pi_q(iw)) + Pi_q(iw) ]

    Oracles: closed-shell == restricted rpa_ecorr_kpts exactly;
    nk=1 == urpa_ecorr_gamma (different DF whitening paths).  The
    reference has no k-point spin RPA (pyscf/gw/rpa.py is molecular);
    contract row: frontend.RPA on KUHF/KUKS."""
    from pyscf_isdf_tpu.df import gdf as gdf_mod
    from pyscf_isdf_tpu.gw.krgw import (
        _k_index_table, _pi_kl, build_lmo_kpts)

    e_s = [np.asarray(e, np.float64) for e in res["mo_energy"]]
    nk, nmo = e_s[0].shape
    if nelec is None:
        spin = system.cell.spin
        ne_tot = system.nelec_tot
        na = (ne_tot + spin * nk) // 2
        nelec = (na // nk, (ne_tot - na) // nk)
    nocc_s = list(nelec)

    kg = gdf_mod.build_gdf_kpts(system.cell, system.aoR_k, system.kpts,
                                system.mesh, system.weight)
    Lmo_s = [build_lmo_kpts(system, res["mo_coeff"][s], kg=kg)
             for s in range(2)]

    freqs, wts = scaled_legendre(nw)
    fj = jnp.asarray(freqs)
    ktab = _k_index_table(system.kpts, system.cell.a)
    total = 0.0
    for kL in range(nk):
        kidx = ktab[:, kL]
        Pi = 0.0
        for s in range(2):
            no = nocc_s[s]
            if no == 0:
                continue
            L_stack = jnp.stack([Lmo_s[s][i][kidx[i]][:, :no, no:]
                                 for i in range(nk)])
            # _pi_kl carries the restricted (doubly-occupied) factor
            # 4/nk; each spin channel contributes 2/nk -> halve
            Pi = Pi + 0.5 * _pi_kl(
                L_stack, jnp.asarray(e_s[s][:, :no]),
                jnp.asarray(e_s[s][kidx, no:]), fj, nk)
        ev = np.asarray(jnp.linalg.eigvalsh(Pi)).real   # (nw, naux)
        integ = np.sum(np.log(1.0 - ev) + ev, axis=1)
        total += float(np.sum(wts * integ))
    return total / (2.0 * np.pi * nk)
