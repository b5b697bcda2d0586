"""Spin-polarized Gamma-point SCF (UHF / UKS).

Spin-resolved version of :mod:`pyscf_isdf_tpu.scf.hf` (reference semantics:
pyscf/pbc/scf/uhf.py + pyscf/pbc/dft/uks.py): separate alpha/beta density
matrices and Fock builds, shared Coulomb, per-spin exchange, LSDA/
spin-PBE exchange-correlation with potentials from autodiff.

Energy:
    E = sum_s Tr(D_s h) + 1/2 Tr(D_tot J) - 1/2 hyb sum_s Tr(D_s K_s)
        + Exc + E_ewald
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf.diis import DIIS
from pyscf_isdf_tpu.scf.hf import SCFSystem, build_scf_system  # noqa: F401


def _spin_vxc(aoR, ao_grad, dm_a, dm_b, weight, xcspec):
    """Exc and per-spin Vxc matrices (LDA or GGA).

    ``weight`` is the uniform-mesh scalar or a per-point (ng,) vector
    (Becke atomic grids, ops/becke.py) — same dense program either way.
    """
    ta = aoR @ dm_a
    tb = aoR @ dm_b
    rho_a = jnp.maximum(jnp.sum(ta * aoR, axis=-1), 0.0)
    rho_b = jnp.maximum(jnp.sum(tb * aoR, axis=-1), 0.0)
    w_g = jnp.broadcast_to(jnp.asarray(weight, rho_a.dtype), rho_a.shape)
    if xcspec.family == "lda":
        exc, (va, vb), _ = xcspec.exc_vxc_spin(rho_a, rho_b)
        e_xc = jnp.sum(w_g * (rho_a + rho_b) * exc)
        vmat_a = (aoR.T * (w_g * va)) @ aoR
        vmat_b = (aoR.T * (w_g * vb)) @ aoR
        return float(e_xc), np.asarray(vmat_a), np.asarray(vmat_b)
    # GGA / meta-GGA
    ga = 2.0 * jnp.einsum("gi,xgi->xg", ta, ao_grad)
    gb = 2.0 * jnp.einsum("gi,xgi->xg", tb, ao_grad)
    s_aa = jnp.sum(ga * ga, axis=0)
    s_ab = jnp.sum(ga * gb, axis=0)
    s_bb = jnp.sum(gb * gb, axis=0)
    vtau = None
    if xcspec.family == "mgga":
        tga = jnp.einsum("xgi,ij->xgj", ao_grad, dm_a)
        tgb = jnp.einsum("xgi,ij->xgj", ao_grad, dm_b)
        tau_a = 0.5 * jnp.einsum("xgj,xgj->g", tga, ao_grad)
        tau_b = 0.5 * jnp.einsum("xgj,xgj->g", tgb, ao_grad)
        exc, (va, vb), (vsaa, vsab, vsbb), (vta, vtb) = \
            xcspec.exc_vxc_mgga_spin(rho_a, rho_b, s_aa, s_ab, s_bb,
                                     tau_a, tau_b)
        vtau = (vta, vtb)
    else:
        exc, (va, vb), (vsaa, vsab, vsbb) = xcspec.exc_vxc_spin(
            rho_a, rho_b, s_aa, s_ab, s_bb)
    e_xc = jnp.sum(w_g * (rho_a + rho_b) * exc)

    def vmat(vrho, vs_ss, g_s, vs_ab, g_t, vt=None):
        aow = 0.5 * vrho[:, None] * aoR + jnp.einsum(
            "xg,xgi->gi", 2.0 * vs_ss[None, :] * g_s + vs_ab[None, :] * g_t,
            ao_grad)
        half = aoR.T @ (w_g[:, None] * aow)
        out = half + half.T
        if vt is not None:
            out = out + 0.5 * jnp.einsum(
                "xgi,g,xgj->ij", ao_grad, w_g * vt, ao_grad)
        return out

    return (float(e_xc),
            np.asarray(vmat(va, vsaa, ga, vsab, gb,
                            vtau[0] if vtau else None)),
            np.asarray(vmat(vb, vsbb, gb, vsab, ga,
                            vtau[1] if vtau else None)))


def uhf_kernel(
    system: SCFSystem,
    xc: Optional[str] = None,
    exxdiv: str = "ewald",
    nelec: Optional[tuple] = None,
    max_cycle: int = 100,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    dm0=None,
    breaksym: bool = False,
    get_jk=None,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    isdf_precision: Optional[str] = None,
    verbose: bool = False,
    xc_grids: str = "uniform",
):
    """Run spin-polarized SCF. xc=None -> UHF; else UKS.

    get_jk: optional override ``(dm_spin (2,nao,nao), with_k) -> (vj, (vka,
    vkb))`` with vj built from the total density — the ISDF hook.
    df='isdf' installs that hook automatically (FFT J + ISDF GEMM K).
    """
    cell = system.cell
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    k_scale = 1.0 if rsh else hyb
    mad_add = system.madelung
    if rsh:
        mad_add = hyb * system.madelung \
            + (alpha - hyb) * coulomb.madelung_omega(cell, None, omega)
    is_gga = xcspec is not None and xcspec.family in ("gga", "mgga")

    if nelec is None:
        na = (cell.nelectron + cell.spin) // 2
        nb = cell.nelectron - na
    else:
        na, nb = nelec

    aoR = system.aoR
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)
    coulG_k = coulG
    if need_k and exxdiv not in (None, "ewald"):
        coulG_k = jnp.asarray(coulomb.get_coulG(cell, exxdiv=exxdiv))

    if df not in ("fftdf", "isdf", "aegdf"):
        raise ValueError(f"unknown df engine {df!r}: use 'fftdf', 'isdf' "
                         "or 'aegdf'")
    if get_jk is None and df == "aegdf":
        # analytic all-electron DF for the spin-polarized classes
        # (df/aegdf.py; VERDICT r4 next #2 "+spin variants"): vj from
        # the total density, per-spin K, all through the whitened fit
        # tensor — the mesh never enters J/K.
        from pyscf_isdf_tpu.df import aegdf as _ae
        from pyscf_isdf_tpu.df.gdf import _get_jk_cd

        if not getattr(system, "ae", False):
            raise ValueError("df='aegdf' needs build_scf_system(ae=True)")
        if rsh:
            raise NotImplementedError("aegdf + RSH exchange")
        ae_gdf = _ae.build_ae_gdf(cell, omega=system.ae_omega)

        def get_jk(dm_spin, with_k):
            dmj_t = jnp.asarray(dm_spin[0] + dm_spin[1], aoR.dtype)
            vj, _ = _get_jk_cd(ae_gdf.cderi, dmj_t)
            vk = None
            if with_k:
                vk = (_get_jk_cd(ae_gdf.cderi,
                                 jnp.asarray(dm_spin[0], aoR.dtype))[1],
                      _get_jk_cd(ae_gdf.cderi,
                                 jnp.asarray(dm_spin[1], aoR.dtype))[1])
            return vj, vk

    if get_jk is None and need_k:
        coulG_lr = None
        if rsh:
            coulG_lr = jnp.asarray(
                coulomb.get_coulG(cell, exxdiv=None, omega=omega))
        if df == "isdf":
            from pyscf_isdf_tpu.df import isdf as isdf_mod

            if rsh:
                isdfs = isdf_mod.build_isdf_multi(
                    aoR, [coulG_k, coulG_lr], mesh, weight, c=isdf_c,
                    precision=isdf_precision)

                def get_k_one(dmj):
                    return hyb * isdf_mod.get_k(isdfs[0], dmj) \
                        + (alpha - hyb) * isdf_mod.get_k(isdfs[1], dmj)
            else:
                isdf = isdf_mod.build_isdf(aoR, coulG_k, mesh, weight,
                                           c=isdf_c,
                                           precision=isdf_precision)

                def get_k_one(dmj):
                    return isdf_mod.get_k(isdf, dmj)
        else:
            def get_k_one(dmj):
                if not rsh:
                    return fftdf.get_k(aoR, dmj, coulG_k, mesh, weight)
                return hyb * fftdf.get_k(aoR, dmj, coulG_k, mesh, weight) \
                    + (alpha - hyb) * fftdf.get_k(aoR, dmj, coulG_lr, mesh,
                                                  weight)

        def get_jk(dm_spin, with_k):
            dmj = jnp.asarray(dm_spin[0] + dm_spin[1], dtype=aoR.dtype)
            vj = fftdf.get_j(aoR, dmj, coulG, mesh, weight)
            vk = None
            if with_k:
                vk = (get_k_one(jnp.asarray(dm_spin[0], aoR.dtype)),
                      get_k_one(jnp.asarray(dm_spin[1], aoR.dtype)))
            return vj, vk

    ao_grad = None
    if is_gga:
        ao_grad = ao_gradient_fft(aoR, mesh, jnp.asarray(system.Gv, dtype=aoR.dtype))

    # XC-quadrature seam (opt-in Becke atomic grids, ops/becke.py; the
    # spin analog of the scf/hf.py branch) — _spin_vxc takes scalar or
    # per-point weights, so only the arrays swap
    xc_ao, xc_grad, xc_w = aoR, ao_grad, weight
    if xcspec is not None and xc_grids.startswith("becke"):
        from pyscf_isdf_tpu.ops import becke as becke_mod

        if ":" in xc_grids:
            n_rad, n_theta = map(int, xc_grids.split(":", 1)[1].split(","))
            bg = becke_mod.build_becke_grids(cell, n_rad=n_rad,
                                             n_theta=n_theta)
        else:
            bg = becke_mod.build_becke_grids(cell)
        xc_ao, xc_grad = becke_mod.eval_ao_and_grad(
            cell, bg.coords, dtype=aoR.dtype, need_grad=is_gga)
        xc_w = jnp.asarray(bg.weights, dtype=aoR.dtype)
    elif xc_grids != "uniform" and not xc_grids.startswith("becke"):
        raise ValueError(f"unknown xc_grids {xc_grids!r} "
                         "(expected 'uniform' or 'becke[:n_rad,n_theta]')")

    S, hcore, X = system.S, system.hcore, system.X

    def eig(F):
        Fp = X.T @ F @ X
        e, u = np.linalg.eigh(Fp)
        return e, X @ u

    if dm0 is None:
        mo_e, mo_c = eig(hcore)
        dm_a = mo_c[:, :na] @ mo_c[:, :na].T
        dm_b = mo_c[:, :nb] @ mo_c[:, :nb].T
        if breaksym and na == nb:
            # perturb beta channel to allow symmetry breaking
            dm_b = 0.9 * dm_b
    else:
        dm_a, dm_b = dm0

    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False

    for it in range(max_cycle):
        dm_t = dm_a + dm_b
        if get_jk is not None:
            vj_j, vk_pair = get_jk(np.stack([dm_a, dm_b]), need_k)
            vj = np.asarray(vj_j, dtype=np.float64)
        else:
            vj = np.asarray(
                fftdf.get_j(aoR, jnp.asarray(dm_t, aoR.dtype), coulG, mesh, weight),
                dtype=np.float64)
        veff_a = vj.copy()
        veff_b = vj.copy()
        e_xc = 0.0
        if xcspec is not None:
            e_xc, vxc_a, vxc_b = _spin_vxc(
                xc_ao, xc_grad, jnp.asarray(dm_a, aoR.dtype),
                jnp.asarray(dm_b, aoR.dtype), xc_w, xcspec)
            veff_a += vxc_a
            veff_b += vxc_b
        e_k = 0.0
        if need_k:
            if get_jk is not None:
                vka = np.asarray(vk_pair[0], dtype=np.float64)
                vkb = np.asarray(vk_pair[1], dtype=np.float64)
            else:
                vka = np.asarray(fftdf.get_k(aoR, jnp.asarray(dm_a, aoR.dtype),
                                             coulG_k, mesh, weight), dtype=np.float64)
                vkb = np.asarray(fftdf.get_k(aoR, jnp.asarray(dm_b, aoR.dtype),
                                             coulG_k, mesh, weight), dtype=np.float64)
            if exxdiv == "ewald":
                vka = vka + mad_add * (S @ dm_a @ S)
                vkb = vkb + mad_add * (S @ dm_b @ S)
            veff_a -= k_scale * vka
            veff_b -= k_scale * vkb
            e_k = -0.5 * k_scale * (np.einsum("ij,ji->", dm_a, vka)
                                    + np.einsum("ij,ji->", dm_b, vkb))

        Fa = hcore + veff_a
        Fb = hcore + veff_b
        erra = X.T @ (S @ dm_a @ Fa - Fa @ dm_a @ S) @ X
        errb = X.T @ (S @ dm_b @ Fb - Fb @ dm_b @ S) @ X
        err = np.concatenate([erra.ravel(), errb.ravel()])
        Fab = diis.update(np.stack([Fa, Fb]), err)
        Fa, Fb = Fab[0], Fab[1]

        ea, ca = eig(Fa)
        eb, cb = eig(Fb)
        dm_a_new = ca[:, :na] @ ca[:, :na].T
        dm_b_new = cb[:, :nb] @ cb[:, :nb].T

        e_elec = (
            np.einsum("ij,ji->", dm_t, hcore)
            + 0.5 * np.einsum("ij,ji->", dm_t, vj)
            + e_xc + e_k
        )
        e_tot = float(e_elec + system.e_nuc)
        de = abs(e_tot - e_last)
        err_norm = np.linalg.norm(err) / max(1, err.size) ** 0.5
        if verbose:
            print(f"cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}  |err| = {err_norm:.2e}")
        if de < conv_tol and err_norm < np.sqrt(conv_tol):
            conv = True
            dm_a, dm_b = dm_a_new, dm_b_new
            break
        dm_a, dm_b = dm_a_new, dm_b_new
        e_last = e_tot

    ssq = _spin_square(dm_a, dm_b, S, na, nb)
    return {
        "e_tot": e_tot,
        "mo_energy": (ea, eb),
        "mo_coeff": (ca, cb),
        "dm": (dm_a, dm_b),
        "nelec": (na, nb),
        "converged": conv,
        "niter": it + 1,
        "s_squared": ssq,
    }


def _spin_square(dm_a, dm_b, S, na, nb):
    """<S^2> from the UHF overlap of alpha/beta occupied spaces."""
    # <S^2> = S_z(S_z+1) + nb - |<a|b>|_F^2 over occupied orbitals; compute
    # via density matrices: tr(Da S Db S)
    cross = np.einsum("ij,jk,kl,li->", dm_a, S, dm_b, S)
    sz = (na - nb) * 0.5
    return float(sz * (sz + 1) + nb - cross)
