"""Band energies at arbitrary k-points from a converged density.

Reference semantics: pyscf/pbc/scf/khf.py:581-607 (``get_bands``) — build
the Fock operator from the converged density at new "band" k-points and
diagonalize. Supports Hartree, LDA, GGA and (range-unseparated) hybrid
functionals:

  * local part: J + Vxc from the converged density on the grid; GGA
    matrix elements use the band k-point's spectral AO gradients with
    grad rho from the SCF density (product rule, matching the SCF).
  * exact exchange: pair-density FFT build between band AOs and every
    density k-point (fftdf_k.get_k_band); the ewald probe-charge shift
    is applied only when a band k coincides with a density k (the
    reference's member check in _ewald_exxdiv_for_G0, df_jk.py:1446).

Self-consistency contract (tested): bands evaluated AT the SCF k-points
reproduce the converged mo_energy.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf, fftdf_k
from pyscf_isdf_tpu.ops import coulomb, pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy, ao_gradient_fft_k
from pyscf_isdf_tpu.ops.ft_ao import overlap_and_kinetic
from pyscf_isdf_tpu.ops.xc import XCSpec


def get_bands(system, scf_res, kpts_band, xc=None, exxdiv="ewald"):
    """Band eigenvalues/vectors at ``kpts_band``.

    Args:
        system: SCFSystem (Gamma) or KSCFSystem with converged grid data.
        scf_res: result dict of scf_kernel / kscf_kernel (uses its dm).
        xc: the functional the SCF was run with (None -> Hartree-Fock).

    Returns (mo_energy (nb, nmo), mo_coeff list).
    """
    cell = system.cell
    mesh = system.mesh
    weight = system.weight
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else getattr(xcspec, "omega", 0.0)
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"

    # converged density (and its gradient for GGA) on the grid
    if hasattr(system, "aoR_k"):   # k-sampled SCF system
        aoR_k = system.aoR_k
        kpts_scf = system.kpts
        nk = aoR_k.shape[0]
        dm_k = np.asarray(scf_res["dm"])
        dmj = jnp.asarray(dm_k, aoR_k.dtype)
        t = jnp.einsum("kgi,kij->kgj", aoR_k, dmj)
        rho = jnp.einsum("kgj,kgj->g", t, aoR_k.conj()).real / nk
        grho = None
        if is_gga:
            coords_j = jnp.asarray(cell.uniform_grid())
            Gv_j = jnp.asarray(cell.get_Gv())
            ao_grad_k = jnp.stack([
                ao_gradient_fft_k(aoR_k[k], mesh, Gv_j,
                                  jnp.asarray(kpts_scf[k]), coords_j)
                for k in range(nk)
            ])
            grho = 2.0 / nk * jnp.einsum("kgj,kxgj->xg", t.conj(),
                                         ao_grad_k).real
    else:
        aoR_k = system.aoR[None].astype(
            jnp.complex128 if system.aoR.dtype == jnp.float64
            else jnp.complex64)
        kpts_scf = np.zeros((1, 3))
        nk = 1
        dm_k = np.asarray(scf_res["dm"])[None]
        dmj = jnp.asarray(dm_k, aoR_k.dtype)
        dm = jnp.asarray(scf_res["dm"], system.aoR.dtype)
        rho = fftdf.get_rho(system.aoR, dm)
        grho = None
        if is_gga:
            from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft

            ao_grad = ao_gradient_fft(system.aoR, mesh,
                                      jnp.asarray(system.Gv,
                                                  system.aoR.dtype))
            tg = system.aoR @ dm
            grho = 2.0 * jnp.einsum("gi,xgi->xg", tg, ao_grad)

    coulG = jnp.asarray(system.coulG)
    cdt = aoR_k.dtype
    vR = fftdf.ifft3(coulG * fftdf.fft3(rho.astype(cdt), mesh), mesh).real
    vrho = None
    vsigma = None
    if xcspec is not None:
        rho_j = jnp.maximum(rho, 1e-30)
        if is_gga:
            sigma_g = jnp.maximum(jnp.sum(grho * grho, axis=0), 1e-30)
            _, vrho, vsigma = xcspec.exc_vxc(rho_j, sigma_g)
        else:
            _, vrho, _ = xcspec.exc_vxc(rho_j)
            vR = vR + vrho
    vR_np = np.asarray(vR, dtype=np.float64)

    coords = cell.uniform_grid()
    kpts_band = np.reshape(np.asarray(kpts_band, dtype=np.float64), (-1, 3))
    kweight = weight / nk
    es, cs = [], []
    for kb in kpts_band:
        aoRb = eval_ao_numpy(cell, kpt=kb)
        S, T = overlap_and_kinetic(cell, kpt=kb)
        S = np.asarray(S, complex)
        if cell.pseudos:
            vloc, _ = pp_ops.get_vpploc(cell, aoRb)
            hk = np.asarray(T, complex) + vloc + pp_ops.get_vppnl(cell, kpt=kb)
        else:
            hk = np.asarray(T, complex) + pp_ops.get_nuc(cell, aoRb)
        F = hk + (aoRb.conj().T * vR_np) @ aoRb * weight
        if is_gga:
            aoRb_j = jnp.asarray(aoRb, cdt)
            ao_grad_b = ao_gradient_fft_k(
                aoRb_j, mesh, jnp.asarray(cell.get_Gv()),
                jnp.asarray(kb), jnp.asarray(coords))
            aow = 0.5 * vrho[:, None] * aoRb_j + 2.0 * jnp.einsum(
                "xg,g,xgi->gi", grho, vsigma, ao_grad_b)
            half = weight * jnp.einsum("gi,gj->ij", aoRb_j.conj(), aow)
            F = F + np.asarray(half + half.conj().T)
        if need_k:
            # exxdiv='vcut_sph' modifies the kernel itself (finite at q=0,
            # no probe-charge shift needed) — used by the staggered-mesh
            # MP2 non-SCF bands (reference kmp2_stagger.py:268-272)
            pair_exxdiv = "vcut_sph" if exxdiv == "vcut_sph" else None
            coulG_bk = jnp.asarray(np.stack([
                coulomb.get_coulG(cell, k=kpts_scf[k2] - kb,
                                  exxdiv=pair_exxdiv, kpts=kpts_scf)
                for k2 in range(nk)
            ]))
            expmikr_bk = jnp.asarray(np.stack([
                np.exp(-1j * coords @ (kpts_scf[k2] - kb))
                for k2 in range(nk)
            ]), cdt)
            aoRb_j = jnp.asarray(aoRb, cdt)
            vk = hyb * np.asarray(fftdf_k.get_k_band(
                aoRb_j, aoR_k, dmj, coulG_bk, expmikr_bk,
                mesh, kweight), dtype=complex)
            mad_add = hyb * coulomb.madelung(cell, kpts_scf)
            if rsh:
                # omega-split LR exchange, same convention as the SCF
                # kernels (reference pbc/dft/rks.py:108-121 semantics)
                coulG_bk_lr = jnp.asarray(np.stack([
                    coulomb.get_coulG(cell, k=kpts_scf[k2] - kb,
                                      exxdiv=None, kpts=kpts_scf,
                                      omega=omega)
                    for k2 in range(nk)
                ]))
                vk = vk + (alpha - hyb) * np.asarray(fftdf_k.get_k_band(
                    aoRb_j, aoR_k, dmj, coulG_bk_lr, expmikr_bk,
                    mesh, kweight), dtype=complex)
                mad_add += (alpha - hyb) * coulomb.madelung_omega(
                    cell, kpts_scf, omega)
            if exxdiv == "ewald":
                # probe-charge shift only when kb coincides with an SCF k
                hits = np.nonzero(
                    np.linalg.norm(kpts_scf - kb, axis=1) < 1e-8)[0]
                if len(hits):
                    vk = vk + mad_add * (S @ dm_k[hits[0]] @ S)
            F = F - 0.5 * vk
        w_s, v_s = np.linalg.eigh(S)
        keep = w_s > 1e-12
        X = v_s[:, keep] / np.sqrt(w_s[keep])
        e, u = np.linalg.eigh(X.conj().T @ F @ X)
        es.append(e)
        cs.append(X @ u)
    return np.array(es), cs
