"""Spin-polarized (UHF/UKS) nuclear gradients by autodiff.

Same construction as grad/rhf.py with two spin channels: the
uhf_kernel energy functional (scf/uhf.py:170-230 conventions — total-
density Hartree, per-spin exchange with k_scale=0.5*... semantics,
spin-resolved XC) traced through positions; Pulay uses the per-spin
energy-weighted DMs. FD-validated in tests/test_grad.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.ops import pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import (PackedBasis, eval_ao_positions,
                                        ao_gradient_fft, shell_rcut)
from pyscf_isdf_tpu.ops.ft_ao import converged_st_mesh
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.grad.rhf import (_ft_factors, _vnl_tables, _EwaldData)


def make_uhf_energy_fn(system, xc=None, exxdiv="ewald"):
    cell = system.cell
    mesh = tuple(system.mesh)
    weight = system.weight
    vol = cell.vol
    coulG = jnp.asarray(system.coulG)
    Gv_mesh = jnp.asarray(cell.get_Gv(cell.mesh))
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad = system.madelung if exxdiv == "ewald" else 0.0
    from pyscf_isdf_tpu.ops import coulomb as _coulomb
    coulG_lr = None
    mad_add = hyb * mad
    if rsh:
        coulG_lr = jnp.asarray(
            _coulomb.get_coulG(cell, exxdiv=None, omega=omega))
        mad_lr = _coulomb.madelung_omega(cell, None, omega) \
            if exxdiv == "ewald" else 0.0
        mad_add = hyb * mad + (alpha - hyb) * mad_lr

    packed = PackedBasis.from_cell(cell)
    rcut = max(shell_rcut(sh) for sh in cell.shells)
    images = jnp.asarray(lattice.lattice_images(cell.a, rcut, cell.dimension))
    coords = jnp.asarray(cell.uniform_grid())

    st_mesh = converged_st_mesh(cell)
    Gv_st = lattice.get_Gv(cell.a, st_mesh)
    fG_st, ao_atom = _ft_factors(cell, Gv_st)
    fG_st = jnp.asarray(fG_st)
    Gv_stj = jnp.asarray(Gv_st)
    G2_st = jnp.asarray(np.einsum("gi,gi->g", Gv_st, Gv_st))

    has_pp = bool(cell.pseudos)
    if has_pp:
        vlocG = jnp.asarray(pp_ops.gth_vlocG(cell, cell.get_Gv(cell.mesh)))
        alpha0 = float(np.sum(pp_ops.gth_alphas(cell)))
        vnl_tabs = _vnl_tables(cell)
        fG_mesh, _ = _ft_factors(cell, cell.get_Gv(cell.mesh))
        fG_mesh = jnp.asarray(fG_mesh)
    else:
        charges = jnp.asarray(cell.charges, dtype=jnp.float64)
    ewald_data = _EwaldData(cell)
    ao_atom_j = jnp.asarray(ao_atom)

    def energy(positions, dm_a, dm_b, w_mat, mo_a, mo_b):
        aoR = eval_ao_positions(packed, coords, images, positions)
        ph = jnp.exp(-1j * Gv_stj @ positions.T)
        aoG = fG_st * ph[:, ao_atom_j]
        S = jnp.real(aoG.conj().T @ aoG) / vol
        T = jnp.real((aoG.conj() * (0.5 * G2_st)[:, None]).T @ aoG) / vol
        dm_t = dm_a + dm_b

        e1 = jnp.sum(dm_t * T)
        ph_mesh = jnp.exp(-1j * Gv_mesh @ positions.T)
        if has_pp:
            SI = ph_mesh.T
            vpplocG = -jnp.sum(SI * vlocG, axis=0)
            vpplocG = vpplocG.at[0].set(alpha0)
            vR = ifft3(vpplocG, mesh).real
            e1 = e1 + jnp.einsum("pq,gp,g,gq->", dm_t, aoR, vR, aoR)
            aokG = fG_mesh * ph_mesh[:, ao_atom_j] / np.sqrt(vol)
            for ia, h, pYlm in vnl_tabs:
                SPG = jnp.einsum("g,img,gp->imp", SI[ia].conj(), pYlm, aokG)
                e1 = e1 + jnp.real(jnp.einsum(
                    "imp,ij,jmq,qp->", SPG.conj(), h, SPG, dm_t)) / vol
        else:
            rhoG = -charges @ ph_mesh.T
            vneR = ifft3(rhoG * coulG, mesh).real
            e1 = e1 + jnp.einsum("pq,gp,g,gq->", dm_t, aoR, vneR, aoR)

        tt = aoR @ dm_t
        rho_t = jnp.sum(tt * aoR, axis=-1)
        vG = coulG * fft3(rho_t.astype(jnp.complex128), mesh)
        vR_h = ifft3(vG, mesh).real
        e_coul = 0.5 * weight * jnp.sum(rho_t * vR_h)

        e_xc = 0.0
        if xcspec is not None:
            ta = aoR @ dm_a
            tb = aoR @ dm_b
            rho_a = jnp.sum(ta * aoR, axis=-1)
            rho_b = jnp.sum(tb * aoR, axis=-1)
            if is_gga:
                ao_grad = ao_gradient_fft(aoR, mesh, Gv_mesh.astype(aoR.dtype))
                ga = 2.0 * jnp.einsum("gi,xgi->xg", ta, ao_grad)
                gb = 2.0 * jnp.einsum("gi,xgi->xg", tb, ao_grad)
                exc, _, _ = xcspec.exc_vxc_spin(
                    rho_a, rho_b, jnp.sum(ga * ga, 0), jnp.sum(ga * gb, 0),
                    jnp.sum(gb * gb, 0))
            else:
                exc, _, _ = xcspec.exc_vxc_spin(rho_a, rho_b)
            e_xc = weight * jnp.sum((rho_a + rho_b) * exc)

        e_k = 0.0
        if need_k:
            ex = 0.0
            for dm_s, mo_s in ((dm_a, mo_a), (dm_b, mo_b)):
                moR = aoR @ mo_s
                no = moR.shape[1]
                if no:
                    pair = (moR[:, :, None] * moR[:, None, :]) \
                        .reshape(-1, no * no)
                    pG = fft3(pair.T.astype(jnp.complex128), mesh)
                    if hyb != 0:
                        vpair = ifft3(coulG[None, :] * pG, mesh).real
                        ex = ex + hyb * weight * jnp.sum(vpair * pair.T)
                    if rsh:
                        vpair_lr = ifft3(coulG_lr[None, :] * pG, mesh).real
                        ex = ex + (alpha - hyb) * weight \
                            * jnp.sum(vpair_lr * pair.T)
                if exxdiv == "ewald":
                    t1 = dm_s @ S
                    ex = ex + mad_add * jnp.sum(t1 * t1.T)
            e_k = -0.5 * ex

        e_pulay = -jnp.sum(w_mat * S)
        return (e1 + e_coul + e_xc + e_k + ewald_data.energy(positions)
                + e_pulay)

    return energy


def rohf_gradient(system, scf_res, xc=None, exxdiv="ewald",
                  return_energy=False):
    """dE_tot/dR (natm, 3) for a converged Gamma ROHF/ROKS state.

    The energy functional is the SAME spin-resolved one UHF uses (the
    ROHF energy is the UHF expression evaluated at shared spatial
    orbitals), so only the Pulay weight differs: Roothaan canonical
    orbitals do not satisfy per-spin eigenvalue relations, and the
    correct energy-weighted density is the non-canonical

        W = D_a F_a D_a + D_b F_b D_b

    with the converged per-spin Fock matrices (reference
    pyscf/grad/rohf.py:29 make_rdm1e). FD-validated in tests/test_grad.py.
    """
    cell = system.cell
    C = np.asarray(scf_res["mo_coeff"])
    nb = (system.nelec - cell.spin) // 2
    na = system.nelec - nb
    dm_a = jnp.asarray(scf_res["dm"][0], dtype=jnp.float64)
    dm_b = jnp.asarray(scf_res["dm"][1], dtype=jnp.float64)
    fa, fb = (jnp.asarray(f, dtype=jnp.float64) for f in scf_res["fock"])
    w_mat = dm_a @ fa @ dm_a + dm_b @ fb @ dm_b
    mo_a = jnp.asarray(C[:, :na])
    mo_b = jnp.asarray(C[:, :nb])

    e_fn = make_uhf_energy_fn(system, xc=xc, exxdiv=exxdiv)
    pos0 = jnp.asarray(cell.coords, dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(pos0, dm_a, dm_b, w_mat, mo_a, mo_b)
    e_tot = float(val) + float(jnp.sum(w_mat * jnp.asarray(system.S)))
    if return_energy:
        return np.asarray(grad), e_tot
    return np.asarray(grad)


def uhf_gradient(system, scf_res, xc=None, exxdiv="ewald",
                 return_energy=False):
    """dE_tot/dR (natm, 3) for a converged Gamma spin-polarized SCF."""
    cell = system.cell
    ea, eb = (np.asarray(e) for e in scf_res["mo_energy"])
    ca, cb = (np.asarray(c) for c in scf_res["mo_coeff"])
    nelec = system.nelec
    spin = cell.spin
    nb = (nelec - spin) // 2
    na = nelec - nb
    dm_a = jnp.asarray(scf_res["dm"][0], dtype=jnp.float64)
    dm_b = jnp.asarray(scf_res["dm"][1], dtype=jnp.float64)
    w_mat = jnp.asarray((ca[:, :na] * ea[:na]) @ ca[:, :na].T
                        + (cb[:, :nb] * eb[:nb]) @ cb[:, :nb].T)
    mo_a = jnp.asarray(ca[:, :na])
    mo_b = jnp.asarray(cb[:, :nb])

    e_fn = make_uhf_energy_fn(system, xc=xc, exxdiv=exxdiv)
    pos0 = jnp.asarray(cell.coords, dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(pos0, dm_a, dm_b, w_mat, mo_a, mo_b)
    e_tot = float(val) + float(jnp.sum(w_mat * jnp.asarray(system.S)))
    if return_energy:
        return np.asarray(grad), e_tot
    return np.asarray(grad)
