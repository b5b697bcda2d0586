"""k-point restricted open-shell SCF (KROHF).

Roothaan single-Fock construction at every k-point (reference semantics:
pyscf/pbc/scf/krohf.py:383 built on pyscf/scf/rohf.py): per-spin
UHF-style veff combined into the projector-coupled effective Fock

    R_k = 1/2 (P_c^H Fc P_c + P_o^H Fc P_o + P_v^H Fc P_v) + h.c.
          + P_o^H Fb P_c + P_o^H Fa P_v + P_v^H Fc P_c,   Fc = (Fa+Fb)/2,

so doubly-, singly-occupied and virtual spaces share one Bloch orbital
set per k. Occupations are a global fill across k: the lowest nb*nk
orbitals doubly occupied, the next (na-nb)*nk singly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf_k
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf.diis import DIIS
from pyscf_isdf_tpu.scf.khf import KSCFSystem, build_kscf_system  # noqa: F401


def _occupations(mo_e_k, n_docc, n_socc):
    """Global (2/1/0) fill: n_docc doubly + n_socc singly occupied."""
    all_e = np.sort(np.hstack(mo_e_k))
    e_d = all_e[n_docc - 1] if n_docc > 0 else -np.inf
    occs = []
    for e in mo_e_k:
        o = np.zeros_like(e)
        o[e <= e_d + 1e-12] = 2.0
        occs.append(o)
    # singly occupied: next n_socc lowest among the rest
    if n_socc > 0:
        rest = np.sort(np.hstack([e[o < 2] for e, o in zip(mo_e_k, occs)]))
        e_s = rest[n_socc - 1]
        for e, o in zip(mo_e_k, occs):
            o[(o < 2) & (e <= e_s + 1e-12)] = 1.0
    return occs


def krohf_kernel(
    system: KSCFSystem,
    xc: Optional[str] = None,
    exxdiv: str = "ewald",
    nelec: Optional[tuple] = None,
    max_cycle: int = 100,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    isdf_precision: Optional[str] = None,
    verbose: bool = False,
):
    """Run KROHF (xc=None) or KROKS to convergence."""
    if isdf_precision is not None:
        if isdf_precision != "dd":
            raise ValueError(f"unknown isdf_precision {isdf_precision!r}")
        if df != "isdf":
            raise ValueError(
                "isdf_precision='dd' needs the ISDF engine (df='isdf'); "
                f"got df={df!r}")
    cell = system.cell
    nk = len(system.kpts)
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad_add = hyb * system.madelung
    if rsh:
        from pyscf_isdf_tpu.ops import coulomb as _coulomb

        mad_add = hyb * system.madelung \
            + (alpha - hyb) * _coulomb.madelung_omega(cell, system.kpts,
                                                      omega)

    if nelec is None:
        na = (cell.nelectron + cell.spin) // 2
        nb = cell.nelectron - na
    else:
        na, nb = nelec
    assert na >= nb

    aoR_k = system.aoR_k
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)

    if df not in ("fftdf", "isdf"):
        raise ValueError(f"unknown df engine {df!r}: use 'fftdf' or 'isdf'")
    if df == "isdf" and need_k:
        from pyscf_isdf_tpu.df import isdf_k as isdf_k_mod

        isdfk = isdf_k_mod.build_isdf_k(
            cell, aoR_k, system.kpts, c=isdf_c,
            exxdiv=(exxdiv if exxdiv not in (None, "ewald") else None),
            precision=isdf_precision)
        if rsh:
            isdfk_lr = isdf_k_mod.build_isdf_k(
                cell, aoR_k, system.kpts, c=isdf_c, omega=omega,
                precision=isdf_precision)

            def get_k_spin(dm_s):
                dmj = jnp.asarray(dm_s, aoR_k.dtype)
                return hyb * isdf_k_mod.get_k_kpts(isdfk, dmj) \
                    + (alpha - hyb) * isdf_k_mod.get_k_kpts(isdfk_lr, dmj)
        else:
            def get_k_spin(dm_s):
                return hyb * isdf_k_mod.get_k_kpts(
                    isdfk, jnp.asarray(dm_s, aoR_k.dtype))
    else:
        coulG_pairs = jnp.asarray(system.coulG_pairs)
        expmikr = jnp.asarray(system.expmikr, dtype=aoR_k.dtype)
        kweight = weight / nk
        coulG_pairs_lr = None
        if rsh and need_k:
            cpl, _ = fftdf_k.make_k_kernels(cell, system.kpts, omega=omega)
            coulG_pairs_lr = jnp.asarray(cpl)

        def get_k_spin(dm_s):
            dmj = jnp.asarray(dm_s, aoR_k.dtype)
            vk = hyb * fftdf_k.get_k_kpts(aoR_k, dmj, coulG_pairs, expmikr,
                                          mesh, kweight) \
                if hyb != 0 else 0.0
            if rsh:
                vk = vk + (alpha - hyb) * fftdf_k.get_k_kpts(
                    aoR_k, dmj, coulG_pairs_lr, expmikr, mesh, kweight)
            return vk

    ao_grad_k = None
    if is_gga:
        from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft_k

        coords = jnp.asarray(cell.uniform_grid())
        Gv = jnp.asarray(cell.get_Gv())
        ao_grad_k = jnp.stack([
            ao_gradient_fft_k(aoR_k[k], mesh, Gv,
                              jnp.asarray(system.kpts[k]), coords)
            for k in range(nk)
        ])

    S, hcore, X = system.S, system.hcore, system.X

    def eig_all(F_k):
        es, cs = [], []
        for k in range(nk):
            Fp = X[k].conj().T @ F_k[k] @ X[k]
            e, u = np.linalg.eigh(Fp)
            es.append(e)
            cs.append(X[k] @ u)
        return es, cs

    mo_e, mo_c = eig_all(hcore)
    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False
    nao = hcore.shape[-1]

    for it in range(max_cycle):
        occs = _occupations(mo_e, nb * nk, (na - nb) * nk)
        dm_a = np.stack([(c * (o >= 1)) @ c.conj().T
                         for c, o in zip(mo_c, occs)])
        dm_b = np.stack([(c * (o == 2)) @ c.conj().T
                         for c, o in zip(mo_c, occs)])
        dm_t = dm_a + dm_b

        vj = np.asarray(fftdf_k.get_j_kpts(
            aoR_k, jnp.asarray(dm_t, aoR_k.dtype), coulG, mesh, weight),
            dtype=np.complex128)
        veff_a = vj.copy()
        veff_b = vj.copy()
        e_xc = 0.0
        if xcspec is not None:
            dmaj = jnp.asarray(dm_a, aoR_k.dtype)
            dmbj = jnp.asarray(dm_b, aoR_k.dtype)
            ta = jnp.einsum("kgi,kij->kgj", aoR_k, dmaj)
            tb = jnp.einsum("kgi,kij->kgj", aoR_k, dmbj)
            rho_a = jnp.maximum(jnp.einsum(
                "kgj,kgj->g", ta, aoR_k.conj()).real / nk, 0.0)
            rho_b = jnp.maximum(jnp.einsum(
                "kgj,kgj->g", tb, aoR_k.conj()).real / nk, 0.0)
            if is_gga:
                ga = 2.0 / nk * jnp.einsum("kgj,kxgj->xg", ta.conj(),
                                           ao_grad_k).real
                gb = 2.0 / nk * jnp.einsum("kgj,kxgj->xg", tb.conj(),
                                           ao_grad_k).real
                s_aa = jnp.sum(ga * ga, axis=0)
                s_ab = jnp.sum(ga * gb, axis=0)
                s_bb = jnp.sum(gb * gb, axis=0)
                exc, (va, vb), (vsaa, vsab, vsbb) = xcspec.exc_vxc_spin(
                    rho_a, rho_b, s_aa, s_ab, s_bb)
                e_xc = float(weight * jnp.sum((rho_a + rho_b) * exc))

                def vmat_k(vrho, vs_ss, g_s, g_t):
                    aow = 0.5 * vrho[:, None] * aoR_k + jnp.einsum(
                        "xg,kxgi->kgi",
                        2.0 * vs_ss[None, :] * g_s + vsab[None, :] * g_t,
                        ao_grad_k)
                    half = weight * jnp.einsum("kgi,kgj->kij",
                                               aoR_k.conj(), aow)
                    return np.asarray(half + half.conj().transpose(0, 2, 1))

                veff_a += vmat_k(va, vsaa, ga, gb)
                veff_b += vmat_k(vb, vsbb, gb, ga)
            else:
                exc, (va, vb), _ = xcspec.exc_vxc_spin(rho_a, rho_b)
                e_xc = float(weight * jnp.sum((rho_a + rho_b) * exc))
                veff_a += np.asarray(weight * jnp.einsum(
                    "kgi,g,kgj->kij", aoR_k.conj(), va, aoR_k))
                veff_b += np.asarray(weight * jnp.einsum(
                    "kgi,g,kgj->kij", aoR_k.conj(), vb, aoR_k))
        e_k = 0.0
        if need_k:
            vka = np.array(get_k_spin(dm_a), dtype=np.complex128)
            vkb = np.array(get_k_spin(dm_b), dtype=np.complex128)
            if exxdiv == "ewald":
                for k in range(nk):
                    vka[k] += mad_add * (S[k] @ dm_a[k] @ S[k])
                    vkb[k] += mad_add * (S[k] @ dm_b[k] @ S[k])
            veff_a -= vka
            veff_b -= vkb
            e_k = -0.5 * (
                np.einsum("kij,kji->", dm_a, vka)
                + np.einsum("kij,kji->", dm_b, vkb)
            ).real / nk

        # Roothaan effective Fock per k
        R_k = np.empty_like(hcore)
        for k in range(nk):
            Fa = hcore[k] + veff_a[k]
            Fb = hcore[k] + veff_b[k]
            Fc = 0.5 * (Fa + Fb)
            Pc = dm_b[k] @ S[k]
            Po = (dm_a[k] - dm_b[k]) @ S[k]
            Pv = np.eye(nao) - dm_a[k] @ S[k]
            R = (0.5 * (Pc.conj().T @ Fc @ Pc + Po.conj().T @ Fc @ Po
                        + Pv.conj().T @ Fc @ Pv)
                 + Po.conj().T @ Fb @ Pc
                 + Po.conj().T @ Fa @ Pv
                 + Pv.conj().T @ Fc @ Pc)
            R_k[k] = R + R.conj().T

        err = np.concatenate([
            (X[k].conj().T
             @ (S[k] @ dm_t[k] @ R_k[k] - R_k[k] @ dm_t[k] @ S[k])
             @ X[k]).ravel()
            for k in range(nk)
        ])
        R_k = diis.update(R_k, err)
        mo_e, mo_c = eig_all(R_k)

        e1 = np.einsum("kij,kji->", dm_t, hcore).real / nk
        ecoul = 0.5 * np.einsum("kij,kji->", dm_t, vj).real / nk
        e_tot = float(e1 + ecoul + e_xc + e_k + system.e_nuc)
        de = abs(e_tot - e_last)
        err_norm = np.linalg.norm(err) / max(1, err.size) ** 0.5
        if verbose:
            print(f"cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}  "
                  f"|err| = {err_norm:.2e}")
        if de < conv_tol and err_norm < np.sqrt(conv_tol):
            conv = True
            break
        e_last = e_tot

    occs = _occupations(mo_e, nb * nk, (na - nb) * nk)
    return {
        "e_tot": e_tot,
        "mo_energy": mo_e,
        "mo_coeff": mo_c,
        "mo_occ": occs,
        "dm": (dm_a, dm_b),
        "converged": conv,
        "niter": it + 1,
    }
