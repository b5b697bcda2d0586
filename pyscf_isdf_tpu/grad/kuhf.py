"""k-point spin-polarized (KUHF/KUKS) nuclear gradients by autodiff.

Completes the gradient matrix: grad/rhf (Gamma R), grad/uhf (Gamma U),
grad/khf (k R), and this module (k U). Conventions follow
scf/kuhf.py:100-215 — total-density Hartree, per-spin (k1,k2) exchange
with per-spin madelung shifts, (1/nk)-weighted spin densities for XC.
FD-validated in tests/test_kgrad.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.ops import pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import (PackedBasis, eval_ao_positions,
                                        ao_gradient_fft_k, shell_rcut)
from pyscf_isdf_tpu.ops.ft_ao import converged_st_mesh
from pyscf_isdf_tpu.scf import occupations as occupations_mod
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.grad.rhf import _ft_factors, _vnl_tables, _EwaldData


def make_kuhf_energy_fn(system, xc=None, exxdiv="ewald"):
    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    mesh = tuple(system.mesh)
    weight = system.weight
    vol = cell.vol
    coulG = jnp.asarray(system.coulG)
    coulG_pairs = jnp.asarray(system.coulG_pairs)
    expmikr = jnp.asarray(system.expmikr)
    Gv_mesh = jnp.asarray(cell.get_Gv(cell.mesh))
    coords = jnp.asarray(cell.uniform_grid())
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad = system.madelung if exxdiv == "ewald" else 0.0
    coulG_pairs_lr = None
    mad_add = hyb * mad
    if rsh:
        from pyscf_isdf_tpu.df import fftdf_k as _fftdf_k
        from pyscf_isdf_tpu.ops import coulomb as _coulomb
        cpl, _ = _fftdf_k.make_k_kernels(cell, kpts, omega=omega)
        coulG_pairs_lr = jnp.asarray(cpl)
        mad_lr = _coulomb.madelung_omega(cell, kpts, omega) \
            if exxdiv == "ewald" else 0.0
        mad_add = hyb * mad + (alpha - hyb) * mad_lr

    packed = PackedBasis.from_cell(cell)
    rcut = max(shell_rcut(sh) for sh in cell.shells)
    images = jnp.asarray(lattice.lattice_images(cell.a, rcut, cell.dimension))

    st_mesh = converged_st_mesh(cell)
    Gv_st = lattice.get_Gv(cell.a, st_mesh)
    fG_k, G2_k, kG_st = [], [], []
    for k in kpts:
        f, ao_atom = _ft_factors(cell, Gv_st, kpt=k)
        fG_k.append(jnp.asarray(f))
        kG = Gv_st + k[None, :]
        G2_k.append(jnp.asarray(np.einsum("gi,gi->g", kG, kG)))
        kG_st.append(jnp.asarray(kG))
    ao_atom_j = jnp.asarray(ao_atom)

    has_pp = bool(cell.pseudos)
    if has_pp:
        vlocG = jnp.asarray(pp_ops.gth_vlocG(cell, cell.get_Gv(cell.mesh)))
        alpha0 = float(np.sum(pp_ops.gth_alphas(cell)))
        vnl_tabs = _vnl_tables(cell)
        fG_mesh_k, kG_mesh = [], []
        for k in kpts:
            f, _ = _ft_factors(cell, cell.get_Gv(cell.mesh), kpt=k)
            fG_mesh_k.append(jnp.asarray(f))
            kG_mesh.append(jnp.asarray(cell.get_Gv(cell.mesh) + k[None, :]))
    else:
        charges = jnp.asarray(cell.charges, dtype=jnp.float64)
    ewald_data = _EwaldData(cell)
    kpts_j = [jnp.asarray(k) for k in kpts]

    def energy(positions, dm_a, dm_b, w_k, mo_a, mo_b):
        S_list, aoR_list = [], []
        e1 = 0.0
        ph_mesh = jnp.exp(-1j * Gv_mesh @ positions.T)
        SI = ph_mesh.T
        if has_pp:
            vpplocG = -jnp.sum(SI * vlocG, axis=0)
            vpplocG = vpplocG.at[0].set(alpha0)
            vR_loc = ifft3(vpplocG, mesh).real
        else:
            rhoG = -charges @ SI
            vR_loc = ifft3(rhoG * coulG, mesh).real
        for k in range(nk):
            dm_t = dm_a[k] + dm_b[k]
            aoRk = eval_ao_positions(packed, coords, images, positions,
                                     kpt=kpts_j[k])
            aoR_list.append(aoRk)
            phk = jnp.exp(-1j * kG_st[k] @ positions.T)
            aoG = fG_k[k] * phk[:, ao_atom_j]
            Sk = (aoG.conj().T @ aoG) / vol
            Tk = ((aoG.conj() * (0.5 * G2_k[k])[:, None]).T @ aoG) / vol
            S_list.append(Sk)
            e1 = e1 + jnp.real(jnp.sum(dm_t * Tk.T))
            e1 = e1 + jnp.real(jnp.einsum(
                "pq,gp,g,gq->", dm_t, aoRk.conj(), vR_loc, aoRk))
            if has_pp:
                phk_m = jnp.exp(-1j * kG_mesh[k] @ positions.T)
                aokG = fG_mesh_k[k] * phk_m[:, ao_atom_j] / np.sqrt(vol)
                for ia, h, pYlm in vnl_tabs:
                    SPG = jnp.einsum("g,img,gp->imp", SI[ia].conj(), pYlm,
                                     aokG)
                    e1 = e1 + jnp.real(jnp.einsum(
                        "imp,ij,jmq,qp->", SPG.conj(), h, SPG, dm_t)
                    ) / vol
        e1 = e1 / nk

        rho_a = 0.0
        rho_b = 0.0
        for k in range(nk):
            ta = aoR_list[k] @ dm_a[k]
            tb = aoR_list[k] @ dm_b[k]
            rho_a = rho_a + jnp.real(
                jnp.sum(ta * aoR_list[k].conj(), axis=-1))
            rho_b = rho_b + jnp.real(
                jnp.sum(tb * aoR_list[k].conj(), axis=-1))
        rho_a, rho_b = rho_a / nk, rho_b / nk
        rho_t = rho_a + rho_b
        vG = coulG * fft3(rho_t.astype(jnp.complex128), mesh)
        vR_h = ifft3(vG, mesh).real
        e_coul = 0.5 * weight * jnp.sum(rho_t * vR_h)

        e_xc = 0.0
        if xcspec is not None:
            if is_gga:
                ga = 0.0
                gb = 0.0
                for k in range(nk):
                    ao_grad = ao_gradient_fft_k(
                        aoR_list[k], mesh, Gv_mesh, kpts_j[k], coords)
                    ta = aoR_list[k] @ dm_a[k]
                    tb = aoR_list[k] @ dm_b[k]
                    ga = ga + 2.0 * jnp.real(
                        jnp.einsum("gi,xgi->xg", ta.conj(), ao_grad))
                    gb = gb + 2.0 * jnp.real(
                        jnp.einsum("gi,xgi->xg", tb.conj(), ao_grad))
                ga, gb = ga / nk, gb / nk
                exc, _, _ = xcspec.exc_vxc_spin(
                    rho_a, rho_b, jnp.sum(ga * ga, 0),
                    jnp.sum(ga * gb, 0), jnp.sum(gb * gb, 0))
            else:
                exc, _, _ = xcspec.exc_vxc_spin(rho_a, rho_b)
            e_xc = weight * jnp.sum(rho_t * exc)

        e_k = 0.0
        if need_k:
            ex = 0.0
            for dm_s, mo_s in ((dm_a, mo_a), (dm_b, mo_b)):
                for k1 in range(nk):
                    mo1 = aoR_list[k1] @ mo_s[k1]
                    for k2 in range(nk):
                        mo2 = aoR_list[k2] @ mo_s[k2]
                        pair = (mo1.conj()[:, :, None] * mo2[:, None, :]) \
                            * expmikr[k2, k1][:, None, None]
                        no1, no2 = pair.shape[1], pair.shape[2]
                        if no1 == 0 or no2 == 0:
                            continue
                        pflat = pair.reshape(-1, no1 * no2).T
                        pG = fft3(pflat, mesh)
                        if hyb != 0:
                            vpair = ifft3(coulG_pairs[k2, k1][None, :] * pG,
                                          mesh)
                            ex = ex + hyb * weight * jnp.real(
                                jnp.sum(vpair * pflat.conj()))
                        if rsh:
                            vpair_lr = ifft3(
                                coulG_pairs_lr[k2, k1][None, :] * pG, mesh)
                            ex = ex + (alpha - hyb) * weight * jnp.real(
                                jnp.sum(vpair_lr * pflat.conj()))
            ex = ex / nk**2
            if exxdiv == "ewald":
                for dm_s in (dm_a, dm_b):
                    for k in range(nk):
                        t1 = dm_s[k] @ S_list[k]
                        ex = ex + mad_add * jnp.real(
                            jnp.sum(t1 * t1.T)) / nk
            # per-spin exchange: e_k = -0.5 sum_spin tr(D K)/nk
            e_k = -0.5 * ex

        e_pulay = 0.0
        for k in range(nk):
            e_pulay = e_pulay - jnp.real(jnp.sum(w_k[k] * S_list[k].T)) / nk

        return (e1 + e_coul + e_xc + e_k + ewald_data.energy(positions)
                + e_pulay)

    return energy


def kuhf_gradient(system, scf_res, xc=None, exxdiv="ewald",
                  return_energy=False):
    """dE_tot/dR (natm, 3) for a converged k-point spin-polarized SCF."""
    cell = system.cell
    nk = len(system.kpts)
    ea, eb = scf_res["mo_energy"]
    ca, cb = scf_res["mo_coeff"]
    dm_a = [jnp.asarray(d) for d in scf_res["dm"][0]]
    dm_b = [jnp.asarray(d) for d in scf_res["dm"][1]]
    nelec = cell.nelectron
    spin = cell.spin
    nb_tot = (nelec - spin) * nk // 2
    na_tot = nelec * nk - nb_tot

    def occs(mo_e_k, ntot):
        # Exactly ntot spin orbitals (<=fermi overfills degenerate ties)
        return occupations_mod.exact_count_occ(mo_e_k, ntot, scale=1.0)

    occ_a = occs(ea, na_tot)
    occ_b = occs(eb, nb_tot)
    w_k, mo_a, mo_b = [], [], []
    for k in range(nk):
        wa = np.asarray(ca[k])[:, occ_a[k] > 0]
        wb = np.asarray(cb[k])[:, occ_b[k] > 0]
        ea_k = np.asarray(ea[k])[occ_a[k] > 0]
        eb_k = np.asarray(eb[k])[occ_b[k] > 0]
        w_k.append(jnp.asarray((wa * ea_k) @ wa.conj().T
                               + (wb * eb_k) @ wb.conj().T))
        mo_a.append(jnp.asarray(wa))
        mo_b.append(jnp.asarray(wb))

    e_fn = make_kuhf_energy_fn(system, xc=xc, exxdiv=exxdiv)
    pos0 = jnp.asarray(cell.coords, dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(pos0, dm_a, dm_b, w_k, mo_a, mo_b)
    e_tot = float(val) + float(sum(
        jnp.real(jnp.sum(w_k[k] * jnp.asarray(system.S[k]).T))
        for k in range(nk)) / nk)
    if return_energy:
        return np.asarray(grad), e_tot
    return np.asarray(grad)
