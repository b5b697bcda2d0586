"""k-point nuclear gradients by autodiff (KRHF/KRKS forces).

Same construction as grad/rhf.py at every k: the converged-density
energy functional of kscf_kernel (scf/khf.py:260-340 conventions —
1/nk-weighted traces, exchange over (k1,k2) pair densities with the
coulG(k2-k1) kernels, ewald madelung shift) with every position
dependence traced, differentiated in one jax.grad. Replaces the
reference's get_j_e1_kpts/get_k_e1_kpts analytic kernels
(pyscf/pbc/df/fft_jk.py:111,304).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.df import fftdf_k
from pyscf_isdf_tpu.ops import pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import (PackedBasis, eval_ao_positions,
                                        ao_gradient_fft_k, shell_rcut)
from pyscf_isdf_tpu.ops.ft_ao import converged_st_mesh
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.grad.rhf import _ft_factors, _vnl_tables, _EwaldData


def make_kenergy_fn(system, xc=None, exxdiv="ewald"):
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
    coords_np = cell.uniform_grid()
    coords = jnp.asarray(coords_np)
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad = system.madelung if exxdiv == "ewald" else 0.0
    # RSH (scf/khf.py:135-142 semantics): hyb*K_full + (alpha-hyb)*K_LR,
    # each with its own probe-charge madelung
    coulG_pairs_lr = None
    mad_add = hyb * mad
    if rsh:
        from pyscf_isdf_tpu.ops import coulomb as _coulomb
        cpl, _ = fftdf_k.make_k_kernels(cell, kpts, omega=omega)
        coulG_pairs_lr = jnp.asarray(cpl)
        mad_lr = _coulomb.madelung_omega(cell, kpts, omega) \
            if exxdiv == "ewald" else 0.0
        mad_add = hyb * mad + (alpha - hyb) * mad_lr

    packed = PackedBasis.from_cell(cell)
    rcut = max(shell_rcut(sh) for sh in cell.shells)
    images = jnp.asarray(lattice.lattice_images(cell.a, rcut, cell.dimension))

    st_mesh = converged_st_mesh(cell)
    Gv_st = lattice.get_Gv(cell.a, st_mesh)
    fG_k, G2_k = [], []
    for k in kpts:
        f, ao_atom = _ft_factors(cell, Gv_st, kpt=k)
        fG_k.append(jnp.asarray(f))
        kG = Gv_st + k[None, :]
        G2_k.append(jnp.asarray(np.einsum("gi,gi->g", kG, kG)))
    kG_st = [jnp.asarray(Gv_st + k[None, :]) for k in kpts]
    ao_atom_j = jnp.asarray(ao_atom)

    has_pp = bool(cell.pseudos)
    if has_pp:
        vlocG = jnp.asarray(pp_ops.gth_vlocG(cell, cell.get_Gv(cell.mesh)))
        alpha0 = float(np.sum(pp_ops.gth_alphas(cell)))
        vnl_tabs = _vnl_tables(cell)
        fG_mesh_k = []
        for k in kpts:
            f, _ = _ft_factors(cell, cell.get_Gv(cell.mesh), kpt=k)
            fG_mesh_k.append(jnp.asarray(f))
        kG_mesh = [jnp.asarray(cell.get_Gv(cell.mesh) + k[None, :])
                   for k in kpts]
    else:
        charges = jnp.asarray(cell.charges, dtype=jnp.float64)
    ewald_data = _EwaldData(cell)
    kpts_j = [jnp.asarray(k) for k in kpts]

    def energy(positions, dm_k, w_k, mo_w_k):
        e1 = 0.0
        S_list = []
        aoR_list = []
        ph_mesh = jnp.exp(-1j * Gv_mesh @ positions.T)     # (ng, natm)
        for k in range(nk):
            aoRk = eval_ao_positions(packed, coords, images, positions,
                                     kpt=kpts_j[k])
            aoR_list.append(aoRk)
            phk = jnp.exp(-1j * kG_st[k] @ positions.T)
            aoG = fG_k[k] * phk[:, ao_atom_j]
            Sk = (aoG.conj().T @ aoG) / vol
            Tk = ((aoG.conj() * (0.5 * G2_k[k])[:, None]).T @ aoG) / vol
            S_list.append(Sk)
            e1 = e1 + jnp.real(jnp.sum(dm_k[k] * Tk.T))

        if has_pp:
            SI = ph_mesh.T
            vpplocG = -jnp.sum(SI * vlocG, axis=0)
            vpplocG = vpplocG.at[0].set(alpha0)
            vR = ifft3(vpplocG, mesh).real
            for k in range(nk):
                aoRk = aoR_list[k]
                e1 = e1 + jnp.real(jnp.einsum(
                    "pq,gp,g,gq->", dm_k[k], aoRk.conj(), vR, aoRk))
                phk_m = jnp.exp(-1j * kG_mesh[k] @ positions.T)
                aokG = fG_mesh_k[k] * phk_m[:, ao_atom_j] / np.sqrt(vol)
                for ia, h, pYlm in vnl_tabs:
                    SPG = jnp.einsum("g,img,gp->imp", SI[ia].conj(), pYlm,
                                     aokG)
                    e1 = e1 + jnp.real(jnp.einsum(
                        "imp,ij,jmq,qp->", SPG.conj(), h, SPG, dm_k[k])
                    ) / vol
        else:
            rhoG = -charges @ ph_mesh.T
            vneR = ifft3(rhoG * coulG, mesh).real
            for k in range(nk):
                aoRk = aoR_list[k]
                e1 = e1 + jnp.real(jnp.einsum(
                    "pq,gp,g,gq->", dm_k[k], aoRk.conj(), vneR, aoRk))
        e1 = e1 / nk

        # total density and Hartree
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
                    ao_grad = ao_gradient_fft_k(
                        aoR_list[k], mesh, Gv_mesh, kpts_j[k], coords)
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
            for k1 in range(nk):
                mo1 = aoR_list[k1] @ mo_w_k[k1]            # (ng, no)
                for k2 in range(nk):
                    mo2 = aoR_list[k2] @ mo_w_k[k2]
                    # periodized pair densities between k1 and k2
                    pair = (mo1.conj()[:, :, None] * mo2[:, None, :]) \
                        * expmikr[k2, k1][:, None, None]
                    no1, no2 = pair.shape[1], pair.shape[2]
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
                for k in range(nk):
                    t1 = dm_k[k] @ S_list[k]
                    ex = ex + mad_add * jnp.real(jnp.sum(t1 * t1.T)) / nk
            e_k = -0.25 * ex

        e_pulay = 0.0
        for k in range(nk):
            e_pulay = e_pulay - jnp.real(jnp.sum(w_k[k] * S_list[k].T)) / nk

        return (e1 + e_coul + e_xc + e_k + ewald_data.energy(positions)
                + e_pulay)

    return energy


def krhf_gradient(system, scf_res, xc=None, exxdiv="ewald",
                  return_energy=False):
    """dE_tot/dR (natm, 3) for a converged k-point closed-shell SCF."""
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

    e_fn = make_kenergy_fn(system, xc=xc, exxdiv=exxdiv)
    pos0 = jnp.asarray(cell.coords, dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(pos0, dm_k, w_k, mo_w_k)
    e_tot = float(val) + float(sum(
        jnp.real(jnp.sum(w_k[k] * jnp.asarray(system.S[k]).T))
        for k in range(nk)) / nk)
    if return_energy:
        return np.asarray(grad), e_tot
    return np.asarray(grad)
