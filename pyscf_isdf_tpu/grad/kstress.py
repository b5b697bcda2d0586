"""k-point stress tensor by strain autodiff (KRHF/KRKS).

Extends grad/stress.py to k-sampled SCF. Under strain eps the k-points
transform contragradiently (k' = (1+eps)^-T k, they live on the
reciprocal lattice), which makes the Bloch phase k.T and the exchange
phase q.r strain-INVARIANT — those phase tables stay static while the
kernels |G+q|^2, volumes, and collocation scale. The probe-charge
madelung for the Nk-scaled supercell is traced exactly like the Gamma
case. EXCEEDS the reference (no PBC stress in pyscf).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.ao_eval import (PackedBasis, eval_ao_positions,
                                        ao_gradient_fft_k, shell_rcut)
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.grad.stress import _ft_ao_jnp, _gth_vlocG_jnp, \
    _vppnl_energy_jnp


class _ProbeEwald:
    """Traced Ewald energy of one unit probe charge on a (possibly
    Nk-scaled) lattice — the madelung constant is -2x this."""

    def __init__(self, a, precision):
        ew_eta = 1.0 / abs(np.linalg.det(a)) ** (1.0 / 6)
        ew_cut = coulomb._estimate_rcut(ew_eta**2, 0, 1.0, precision)
        self.eta = ew_eta
        self.L0 = jnp.asarray(lattice.lattice_images(a, 1.06 * ew_cut, 3))
        log_prec = np.log(precision / (16 * np.pi**2))
        mesh = lattice.cutoff_to_mesh(a, -2 * ew_eta**2 * log_prec * 1.1)
        Gv = lattice.get_Gv(a, mesh)
        keep = np.einsum("gi,gi->g", Gv, Gv) > 1e-12
        self.Gv0 = jnp.asarray(Gv[keep])
        self.vol0 = abs(np.linalg.det(a))

    def madelung(self, F, Finv, detF):
        L = self.L0 @ F.T
        r2 = jnp.sum(L * L, axis=-1)
        ok = r2 > 1e-16
        r = jnp.sqrt(jnp.where(ok, r2, 1.0))
        ovrl = 0.5 * jnp.sum(jnp.where(ok, erfc(self.eta * r) / r, 0.0))
        Gv = self.Gv0 @ Finv
        G2 = jnp.sum(Gv * Gv, axis=1)
        vol = self.vol0 * detF
        ewg = 0.5 * jnp.sum(jnp.exp(-G2 / (4 * self.eta**2))
                            * 4 * np.pi / G2) / vol
        e = ovrl + ewg - self.eta / np.sqrt(np.pi) \
            - 0.5 * np.pi / (self.eta**2 * vol)
        return -2.0 * e


def _wrapped_kG(cell, q, mesh):
    """Host: wrap-around effective G+q vectors and the boundary-kill mask
    (mirrors ops/coulomb.get_coulG:44-58 / reference pbc.py:278-302).
    The wrap CHOICE is a discrete reciprocal-lattice shift — strain-
    independent — so the returned unstrained vectors transform cleanly
    as kG @ F^-1 under strain."""
    Gv = cell.get_Gv(mesh)
    kG = Gv + q[None, :]
    boundary = np.zeros(Gv.shape[0], dtype=bool)
    if np.abs(q).sum() > 1e-9:
        b = cell.reciprocal_vectors()
        box_edge = (np.asarray(mesh) // 2 + 0.5)[:, None] * b
        reduced = np.linalg.solve(box_edge.T, kG.T).T.round(9)
        on_edge = reduced.astype(int)
        for i in range(cell.dimension):
            boundary |= reduced[:, i] == 1
            boundary |= reduced[:, i] == -1
            kG[on_edge[:, i] == 1] -= 2 * box_edge[i]
            kG[on_edge[:, i] == -1] += 2 * box_edge[i]
    return kG, boundary


def make_kstrain_energy_fn(system, xc=None, exxdiv="ewald"):
    cell = system.cell
    assert cell.dimension == 3
    kpts0 = np.asarray(system.kpts)
    nk = len(kpts0)
    mesh = tuple(system.mesh)
    ngrids = float(np.prod(mesh))
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    omega_abs = abs(float(omega))
    if exxdiv not in (None, "ewald"):
        # the SCF can minimize e.g. vcut_sph functionals; silently
        # differentiating a DIFFERENT functional would be wrong
        raise NotImplementedError(f"k-stress: exxdiv={exxdiv!r} todo")
    is_gga = xcspec is not None and xcspec.family == "gga"

    packed = PackedBasis.from_cell(cell)
    rcut = max(shell_rcut(sh) for sh in cell.shells)
    L0 = jnp.asarray(lattice.lattice_images(cell.a, 1.06 * rcut, 3))
    coords0 = jnp.asarray(cell.uniform_grid())
    R0 = jnp.asarray(cell.coords)
    Gv0 = jnp.asarray(cell.get_Gv(cell.mesh))
    from pyscf_isdf_tpu.ops.ft_ao import converged_st_mesh

    Gv_st0 = jnp.asarray(lattice.get_Gv(cell.a, converged_st_mesh(cell)))
    vol0 = cell.vol
    kpts0_j = jnp.asarray(kpts0)
    # strain-invariant exchange phases e^{-i q.r} (q.r = q0.r0)
    expmikr0 = jnp.asarray(system.expmikr)

    has_pp = bool(cell.pseudos)
    if has_pp:
        from pyscf_isdf_tpu.ops import pp as pp_ops

        alpha0 = float(np.sum(pp_ops.gth_alphas(cell)))
    charges = jnp.asarray(cell.charges, dtype=jnp.float64)

    ew_eta, ew_cut = coulomb.ewald_params(cell)
    Le0 = jnp.asarray(lattice.lattice_images(cell.a, 1.06 * ew_cut, 3))
    log_prec = np.log(cell.precision / (max(np.abs(cell.charges).sum(), 1.0)
                                        * 16 * np.pi**2))
    mesh_e = lattice.cutoff_to_mesh(cell.a, -2 * ew_eta**2 * log_prec * 1.1)
    Gve0_np = lattice.get_Gv(cell.a, mesh_e)
    keep = np.einsum("gi,gi->g", Gve0_np, Gve0_np) > 1e-12
    Gve0 = jnp.asarray(Gve0_np[keep])
    self_q = -0.5 * float(cell.charges @ cell.charges) * 2 * ew_eta \
        / np.sqrt(np.pi)
    sumq2 = float(cell.charges.sum()) ** 2

    # wrap-around exchange kernel vectors per (k1, k2), host-precomputed
    kGq0, bnd_q = {}, {}
    if need_k:
        for k1 in range(nk):
            for k2 in range(nk):
                kg, bnd = _wrapped_kG(cell, kpts0[k2] - kpts0[k1],
                                      cell.mesh)
                kGq0[k1, k2] = jnp.asarray(kg)
                bnd_q[k1, k2] = jnp.asarray(bnd)

    probe = None
    mad_shift = 0.0
    if exxdiv == "ewald" and need_k:
        Nk = coulomb._monkhorst_pack_size(cell, kpts0)
        probe = _ProbeEwald(cell.a * Nk[:, None], cell.precision)
        # pin the eps=0 value to the SCF's own madelung constant (the two
        # independently converged Ewald sums differ at cell.precision;
        # a constant shift preserves the exact gradient)
        eye = jnp.eye(3)
        mad_shift = system.madelung - float(probe.madelung(eye, eye, 1.0))

    # LR (erf-kernel) madelung for RSH: static G-set of the Nk-scaled
    # supercell (madelung_omega formula, ops/coulomb.py:323-356), value
    # pinned at eps=0 to the SCF's own host constant
    Gml0 = None
    mad_lr_shift = 0.0
    vol_sc0 = None
    if rsh and exxdiv == "ewald" and need_k:
        Nk = coulomb._monkhorst_pack_size(cell, kpts0)
        a_sc = cell.a * Nk[:, None]
        vol_sc0 = abs(np.linalg.det(a_sc))
        _prec = getattr(cell, "precision", 1e-8)
        _Ecut = 10.0
        for _ in range(2):
            _Ecut = np.log(16 * np.pi**2
                           / (2 * omega_abs**2 * np.sqrt(2 * _Ecut))
                           / _prec + 1.0) * 2 * omega_abs**2
        _Gml = lattice.get_Gv(a_sc, lattice.cutoff_to_mesh(a_sc,
                                                           _Ecut * 1.1))
        _G2ml = np.einsum("gi,gi->g", _Gml, _Gml)
        _keep = _G2ml > 1e-12
        Gml0 = jnp.asarray(_Gml[_keep])
        _trace0 = 2 * omega_abs / np.sqrt(np.pi) - np.sum(
            4 * np.pi / _G2ml[_keep]
            * np.exp(-0.25 / omega_abs**2 * _G2ml[_keep])) / vol_sc0
        mad_lr_shift = coulomb.madelung_omega(cell, kpts0, omega) - _trace0

    def energy(eps, dm_k, w_k, mo_w_k):
        F = jnp.eye(3) + eps
        Finv = jnp.linalg.inv(F)
        detF = jnp.linalg.det(F)
        vol = vol0 * detF
        weight = vol / ngrids
        pos = R0 @ F.T
        coords = coords0 @ F.T
        images = L0 @ F.T
        kpts = kpts0_j @ Finv
        Gv = Gv0 @ Finv
        Gv_st = Gv_st0 @ Finv
        G2 = jnp.sum(Gv * Gv, axis=1)
        coulG = jnp.where(G2 < 1e-12, 0.0,
                          4 * np.pi / jnp.where(G2 < 1e-12, 1.0, G2))
        ph_mesh = jnp.exp(-1j * Gv @ pos.T)
        SI = ph_mesh.T

        e1 = 0.0
        S_list, aoR_list = [], []
        if has_pp:
            vlocG = _gth_vlocG_jnp(cell, G2)
            vpplocG = -jnp.sum(SI * vlocG, axis=0)
            vpplocG = vpplocG.at[0].set(alpha0)
            vR_loc = ifft3(vpplocG, mesh).real
        else:
            rhoG = -charges @ SI
            vR_loc = ifft3(rhoG * coulG, mesh).real
        for k in range(nk):
            kv = kpts[k]
            aoRk = eval_ao_positions(packed, coords, images, pos, kpt=kv)
            aoR_list.append(aoRk)
            kG_st = Gv_st + kv[None, :]
            aoG = _ft_ao_jnp(cell, kG_st, pos)
            G2k = jnp.sum(kG_st * kG_st, axis=1)
            Sk = (aoG.conj().T @ aoG) / vol
            Tk = ((aoG.conj() * (0.5 * G2k)[:, None]).T @ aoG) / vol
            S_list.append(Sk)
            e1 = e1 + jnp.real(jnp.sum(dm_k[k] * Tk.T))
            e1 = e1 + jnp.real(jnp.einsum("pq,gp,g,gq->", dm_k[k],
                                          aoRk.conj(), vR_loc, aoRk))
            if has_pp:
                kG = Gv + kv[None, :]
                aokG = _ft_ao_jnp(cell, kG, pos) / jnp.sqrt(vol)
                e1 = e1 + _vppnl_energy_jnp(cell, kG, aokG, SI, dm_k[k],
                                            vol)
        e1 = e1 / nk

        rho = 0.0
        for k in range(nk):
            t = aoR_list[k] @ dm_k[k]
            rho = rho + jnp.real(jnp.sum(t * aoR_list[k].conj(), axis=-1))
        rho = rho / nk
        vG = coulG * fft3(rho.astype(jnp.complex128), mesh)
        vR_h = ifft3(vG, mesh).real
        e_coul = 0.5 * weight * jnp.sum(rho * vR_h)

        e_xc = 0.0
        if xcspec is not None:
            if is_gga:
                grho = 0.0
                for k in range(nk):
                    ao_grad = ao_gradient_fft_k(aoR_list[k], mesh, Gv,
                                                kpts[k], coords)
                    t = aoR_list[k] @ dm_k[k]
                    grho = grho + 2.0 * jnp.real(
                        jnp.einsum("gi,xgi->xg", t.conj(), ao_grad))
                grho = grho / nk
                sigma = jnp.sum(grho * grho, axis=0)
                exc, _, _ = xcspec.exc_vxc(rho, sigma)
            else:
                exc, _, _ = xcspec.exc_vxc(rho)
            e_xc = weight * jnp.sum(rho * exc)

        e_k = 0.0
        if need_k:
            ex = 0.0
            moR_k = [aoR_list[k] @ mo_w_k[k] for k in range(nk)]
            for k1 in range(nk):
                mo1 = moR_k[k1]
                for k2 in range(nk):
                    mo2 = moR_k[k2]
                    Gq = kGq0[k1, k2] @ Finv
                    G2q = jnp.sum(Gq * Gq, axis=1)
                    kill = bnd_q[k1, k2] | (G2q < 1e-12)
                    coulG_q = jnp.where(
                        kill, 0.0,
                        4 * np.pi / jnp.where(kill, 1.0, G2q))
                    pair = (mo1.conj()[:, :, None] * mo2[:, None, :]) \
                        * expmikr0[k2, k1][:, None, None]
                    no1, no2 = pair.shape[1], pair.shape[2]
                    pflat = pair.reshape(-1, no1 * no2).T
                    pG = fft3(pflat, mesh)
                    if hyb != 0:
                        vpair = ifft3(coulG_q[None, :] * pG, mesh)
                        ex = ex + hyb * weight * jnp.real(
                            jnp.sum(vpair * pflat.conj()))
                    if rsh:
                        coulG_q_lr = coulG_q * jnp.exp(
                            -0.25 / omega_abs**2 * G2q)
                        vpair_lr = ifft3(coulG_q_lr[None, :] * pG, mesh)
                        ex = ex + (alpha - hyb) * weight * jnp.real(
                            jnp.sum(vpair_lr * pflat.conj()))
            ex = ex / nk**2
            if exxdiv == "ewald":
                mad_eps = hyb * (probe.madelung(F, Finv, detF) + mad_shift)
                if rsh:
                    Gml = Gml0 @ Finv
                    G2ml = jnp.sum(Gml * Gml, axis=1)
                    vol_sc = vol_sc0 * detF
                    mad_lr_eps = 2 * omega_abs / np.sqrt(np.pi) - jnp.sum(
                        4 * np.pi / G2ml
                        * jnp.exp(-0.25 / omega_abs**2 * G2ml)) / vol_sc \
                        + mad_lr_shift
                    mad_eps = mad_eps + (alpha - hyb) * mad_lr_eps
                for k in range(nk):
                    t1 = dm_k[k] @ S_list[k]
                    ex = ex + mad_eps * jnp.real(jnp.sum(t1 * t1.T)) / nk
            e_k = -0.25 * ex

        # nuclear Ewald
        d = (pos[None, :, None, :] - pos[None, None, :, :]
             + (Le0 @ F.T)[:, None, None, :])
        r2 = jnp.sum(d * d, axis=-1)
        tiny = r2 < 1e-16
        r = jnp.sqrt(jnp.where(tiny, 1.0, r2))
        ovrl = 0.5 * jnp.sum(charges[:, None] * charges[None, :]
                             * jnp.where(tiny, 0.0, erfc(ew_eta * r) / r))
        Gve = Gve0 @ Finv
        G2e = jnp.sum(Gve * Gve, axis=1)
        ZSI = jnp.sum(charges[None, :] * jnp.exp(-1j * Gve @ pos.T), axis=1)
        ewg = 0.5 * jnp.sum(jnp.abs(ZSI) ** 2
                            * jnp.exp(-G2e / (4 * ew_eta**2))
                            * 4 * np.pi / G2e) / vol
        e_nuc = ovrl + ewg + self_q \
            - 0.5 * sumq2 * np.pi / (ew_eta**2 * vol)

        e_pulay = 0.0
        for k in range(nk):
            e_pulay = e_pulay \
                - jnp.real(jnp.sum(w_k[k] * S_list[k].T)) / nk

        return e1 + e_coul + e_xc + e_k + e_nuc + e_pulay

    return energy


def kstress_tensor(system, scf_res, xc=None, exxdiv="ewald",
                   return_energy=False):
    """3x3 stress sigma = (1/vol) dE/d eps for a converged k-point SCF."""
    cell = system.cell
    nk = len(system.kpts)
    mo_e = [np.asarray(e) for e in scf_res["mo_energy"]]
    mo_c = [np.asarray(c) for c in scf_res["mo_coeff"]]
    mo_occ = [np.asarray(o) for o in scf_res["mo_occ"]]
    dm_k = [jnp.asarray(d) for d in scf_res["dm"]]
    w_k, mo_w_k = [], []
    for k in range(nk):
        occ = mo_occ[k]
        sel = occ > 0
        c = mo_c[k][:, sel]
        w_k.append(jnp.asarray((c * (mo_e[k][sel] * occ[sel])) @ c.conj().T))
        mo_w_k.append(jnp.asarray(c * np.sqrt(occ[sel])))

    e_fn = make_kstrain_energy_fn(system, xc=xc, exxdiv=exxdiv)
    eps0 = jnp.zeros((3, 3), dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(eps0, dm_k, w_k, mo_w_k)
    g = np.asarray(grad)
    sigma = 0.5 * (g + g.T) / cell.vol
    e_tot = float(val) + float(sum(
        jnp.real(jnp.sum(w_k[k] * jnp.asarray(system.S[k]).T))
        for k in range(nk)) / nk)
    if return_energy:
        return sigma, e_tot, g
    return sigma
