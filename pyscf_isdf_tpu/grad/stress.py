"""Stress tensor by strain autodiff (Gamma point).

sigma_ab = (1/vol) dE/d eps_ab at the SCF stationary point, with the
whole energy functional re-parameterized by a symmetric strain eps:
positions/grid/lattice images scale as (1+eps) r, reciprocal vectors as
(1+eps)^-T G, vol as det(1+eps) vol0 — every lattice-derived constant
(Coulomb kernels, S/T quadrature, GTH form factors, Ewald) becomes a
traced function of eps and one jax.grad yields the full 3x3 tensor.

EXCEEDS the reference: pyscf has no PBC stress tensor (cell-gradient)
implementation. Validated against finite strain differences of
independently converged SCF energies (tests/test_stress.py).
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
                                        shell_rcut)
from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics
from pyscf_isdf_tpu.ops.ft_ao import converged_st_mesh
from pyscf_isdf_tpu.ops.xc import XCSpec


def _ft_ao_jnp(cell, Gv, positions):
    """Analytic AO FTs with BOTH G-vectors and positions traced
    (jnp re-expression of ops/ft_ao.ft_ao)."""
    G2 = jnp.sum(Gv * Gv, axis=1)
    cols = []
    for sh in cell.shells:
        A = positions[sh.atom]
        phase = jnp.exp(-1j * (Gv @ A))
        ang = solid_harmonics(sh.l, Gv, jnp)                   # (ng, M)
        es = jnp.asarray(sh.exps)
        cs = jnp.asarray(sh.coeffs)                            # (P, K)
        rad = ((np.pi / es[None, :]) ** 1.5
               * (2 * es[None, :]) ** (-sh.l)
               * jnp.exp(-G2[:, None] / (4 * es[None, :]))) @ cs  # (ng, K)
        il = (-1j) ** sh.l
        blk = il * phase[:, None, None] * rad[:, :, None] * ang[:, None, :]
        cols.append(blk.reshape(Gv.shape[0], sh.nao))
    return jnp.concatenate(cols, axis=1)


def _gth_vlocG_jnp(cell, G2):
    """(natm, ng) local GTH v_loc(G) with G2 traced (3D branch of
    ops/pp.gth_vlocG)."""
    assert cell.dimension == 3
    G2s = jnp.where(G2 < 1e-12, 1.0, G2)
    coulG = jnp.where(G2 < 1e-12, 0.0, 4 * np.pi / G2s)
    rows = []
    for ia in range(cell.natm):
        Z = cell.charges[ia]
        pp = cell.pseudos.get(cell.symbols[ia])
        if pp is None:
            rows.append(Z * coulG)
            continue
        rloc = pp.rloc
        v = Z * coulG * jnp.exp(-0.5 * rloc**2 * G2)
        v = jnp.where(G2 < 1e-12, -2 * np.pi * Z * rloc**2, v)
        G2r = G2 * rloc**2
        cexp = pp.cexp
        cf = 0.0
        if len(cexp) >= 1:
            cf = cf + cexp[0]
        if len(cexp) >= 2:
            cf = cf + cexp[1] * (3 - G2r)
        if len(cexp) >= 3:
            cf = cf + cexp[2] * (15 - 10 * G2r + G2r**2)
        if len(cexp) >= 4:
            cf = cf + cexp[3] * (105 - 105 * G2r + 21 * G2r**2 - G2r**3)
        v = v - (2 * np.pi) ** 1.5 * rloc**3 * jnp.exp(-0.5 * G2r) * cf
        rows.append(v)
    return jnp.stack(rows)


def _vppnl_energy_jnp(cell, Gv, aokG, SI, dm, vol):
    """Tr(D vppnl) with traced G-vectors (jnp form of ops/pp.get_vppnl)."""
    from pyscf_isdf_tpu.ops.pp import _qli

    # |G| with an AD-safe cone point: the radial factors are smooth even
    # functions of |G|, so the true gradient at G=0 is zero — route it
    # through a where-guard instead of sqrt's infinite slope
    G2 = jnp.sum(Gv * Gv, axis=1)
    G_rad = jnp.where(G2 < 1e-30, 0.0,
                      jnp.sqrt(jnp.where(G2 < 1e-30, 1.0, G2)))
    e = 0.0
    for ia in range(cell.natm):
        pp = cell.pseudos.get(cell.symbols[ia])
        if pp is None:
            continue
        for l, (rl, h) in enumerate(zip(pp.proj_rl, pp.proj_h)):
            nl = len(h)
            if nl == 0:
                continue
            ang = solid_harmonics(l, Gv, jnp)
            radial = rl ** (l + 1.5) * np.pi**1.25 \
                * jnp.exp(-0.5 * (G_rad * rl) ** 2)
            pY = jnp.stack([(ang * (radial * _qli(G_rad * rl, l, i))
                             [:, None]).T for i in range(nl)])  # (nl,M,ng)
            SPG = jnp.einsum("g,img,gp->imp", SI[ia].conj(), pY, aokG)
            e = e + jnp.real(jnp.einsum("imp,ij,jmq,qp->", SPG.conj(),
                                        jnp.asarray(np.asarray(h)), SPG,
                                        dm)) / vol
    return e


def make_strain_energy_fn(system, xc=None, exxdiv="ewald", spin=False):
    """Strain-traced total-energy functional.

    The returned function is SPIN-RESOLVED:
    ``energy(eps, dm_a, dm_b, w_mat, mo_a, mo_b)`` — closed-shell
    callers pass dm/2 twice and the (unit-weight) occupied orbitals
    twice; the per-spin exchange algebra then reduces exactly to the
    restricted expression. ``spin=True`` switches the XC quadrature to
    the spin-resolved functional form (UKS/ROKS); with ``spin=False``
    the restricted exc path is kept bit-for-bit.
    """
    cell = system.cell
    assert cell.dimension == 3, "stress: 3D cells"
    mesh = tuple(system.mesh)
    ngrids = float(np.prod(mesh))
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad = system.madelung if exxdiv == "ewald" else 0.0
    if rsh:
        # static G-set for the traced LR madelung (the madelung_omega
        # formula, ops/coulomb.py:323-356, with its precision-driven mesh;
        # under strain only G and vol change — omega is a physical const)
        omega_abs = abs(float(omega))
        _prec = getattr(cell, "precision", 1e-8)
        _Ecut = 10.0
        for _ in range(2):
            _Ecut = np.log(16 * np.pi**2
                           / (2 * omega_abs**2 * np.sqrt(2 * _Ecut))
                           / _prec + 1.0) * 2 * omega_abs**2
        _mesh_lr = lattice.cutoff_to_mesh(cell.a, _Ecut * 1.1)
        _Gml = lattice.get_Gv(cell.a, _mesh_lr)
        _keep = np.einsum("gi,gi->g", _Gml, _Gml) > 1e-12
        Gml0 = jnp.asarray(_Gml[_keep])

    packed = PackedBasis.from_cell(cell)
    rcut = max(shell_rcut(sh) for sh in cell.shells)
    L0 = jnp.asarray(lattice.lattice_images(cell.a, 1.06 * rcut, 3))
    coords0 = jnp.asarray(cell.uniform_grid())
    R0 = jnp.asarray(cell.coords)
    Gv0 = jnp.asarray(cell.get_Gv(cell.mesh))
    Gv_st0 = jnp.asarray(lattice.get_Gv(cell.a, converged_st_mesh(cell)))
    vol0 = cell.vol

    has_pp = bool(cell.pseudos)
    if has_pp:
        from pyscf_isdf_tpu.ops import pp as pp_ops

        alpha0 = float(np.sum(pp_ops.gth_alphas(cell)))
    charges = jnp.asarray(cell.charges, dtype=jnp.float64)

    # Ewald statics: eta and image/G sets from the unstrained cell (any
    # valid eta gives the same total; the sets are padded by the strain)
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

    def energy(eps, dm_a, dm_b, w_mat, mo_a, mo_b):
        dm = dm_a + dm_b
        F = jnp.eye(3) + eps
        Finv = jnp.linalg.inv(F)
        detF = jnp.linalg.det(F)
        vol = vol0 * detF
        weight = vol / ngrids
        pos = R0 @ F.T
        coords = coords0 @ F.T
        images = L0 @ F.T
        Gv = Gv0 @ Finv                       # rows G -> F^-T G
        Gv_st = Gv_st0 @ Finv
        G2 = jnp.sum(Gv * Gv, axis=1)
        coulG = jnp.where(G2 < 1e-12, 0.0,
                          4 * np.pi / jnp.where(G2 < 1e-12, 1.0, G2))

        aoR = eval_ao_positions(packed, coords, images, pos)
        aoG_st = _ft_ao_jnp(cell, Gv_st, pos)
        G2_st = jnp.sum(Gv_st * Gv_st, axis=1)
        S = jnp.real(aoG_st.conj().T @ aoG_st) / vol
        T = jnp.real((aoG_st.conj() * (0.5 * G2_st)[:, None]).T
                     @ aoG_st) / vol

        e1 = jnp.sum(dm * T)
        ph_mesh = jnp.exp(-1j * Gv @ pos.T)              # (ng, natm)
        SI = ph_mesh.T
        if has_pp:
            vlocG = _gth_vlocG_jnp(cell, G2)
            vpplocG = -jnp.sum(SI * vlocG, axis=0)
            vpplocG = vpplocG.at[0].set(alpha0)
            # matrix elements carry w * N/vol = 1: the ifft's 1/N and the
            # quadrature weight cancel at ANY strain — no explicit vol
            vR = ifft3(vpplocG, mesh).real
            e1 = e1 + jnp.einsum("pq,gp,g,gq->", dm, aoR, vR, aoR)
            aokG = _ft_ao_jnp(cell, Gv, pos) / jnp.sqrt(vol)
            e1 = e1 + _vppnl_energy_jnp(cell, Gv, aokG, SI, dm, vol)
        else:
            rhoG = -charges @ SI
            vneR = ifft3(rhoG * coulG, mesh).real
            e1 = e1 + jnp.einsum("pq,gp,g,gq->", dm, aoR, vneR, aoR)

        t = aoR @ dm
        rho = jnp.sum(t * aoR, axis=-1)
        vG = coulG * fft3(rho.astype(jnp.complex128), mesh)
        vR_h = ifft3(vG, mesh).real
        e_coul = 0.5 * weight * jnp.sum(rho * vR_h)

        e_xc = 0.0
        if xcspec is not None:
            if is_gga:
                # spectral gradient with the strained G-vectors
                fG = fft3(aoR.T.astype(jnp.complex128), mesh)
                grad_ao = jnp.stack([
                    ifft3(1j * Gv[:, x][None, :] * fG, mesh).real.T
                    for x in range(3)])                     # (3, ng, nao)
                if spin:
                    ta = aoR @ dm_a
                    tb = aoR @ dm_b
                    rho_a = jnp.sum(ta * aoR, axis=-1)
                    rho_b = jnp.sum(tb * aoR, axis=-1)
                    ga = 2.0 * jnp.einsum("gi,xgi->xg", ta, grad_ao)
                    gb = 2.0 * jnp.einsum("gi,xgi->xg", tb, grad_ao)
                    exc, _, _ = xcspec.exc_vxc_spin(
                        rho_a, rho_b, jnp.sum(ga * ga, 0),
                        jnp.sum(ga * gb, 0), jnp.sum(gb * gb, 0))
                else:
                    grad_rho = 2.0 * jnp.einsum("gi,xgi->xg", t, grad_ao)
                    sigma = jnp.sum(grad_rho * grad_rho, axis=0)
                    exc, _, _ = xcspec.exc_vxc(rho, sigma)
            elif spin:
                rho_a = jnp.sum((aoR @ dm_a) * aoR, axis=-1)
                rho_b = jnp.sum((aoR @ dm_b) * aoR, axis=-1)
                exc, _, _ = xcspec.exc_vxc_spin(rho_a, rho_b)
            else:
                exc, _, _ = xcspec.exc_vxc(rho)
            e_xc = weight * jnp.sum(rho * exc)

        e_k = 0.0
        if need_k:
            ex = 0.0
            for mo_s in (mo_a, mo_b):
                moR = aoR @ mo_s
                no = moR.shape[1]
                if no == 0:
                    continue
                pair = (moR[:, :, None] * moR[:, None, :]) \
                    .reshape(-1, no * no)
                pG = fft3(pair.T.astype(jnp.complex128), mesh)
                if hyb != 0:
                    vpair = ifft3(coulG[None, :] * pG, mesh).real
                    ex = ex + hyb * weight * jnp.sum(vpair * pair.T)
                if rsh:
                    coulG_lr = jnp.where(
                        G2 < 1e-12, 0.0,
                        coulG * jnp.exp(-0.25 / omega_abs**2 * G2))
                    vpair_lr = ifft3(coulG_lr[None, :] * pG, mesh).real
                    ex = ex + (alpha - hyb) * weight \
                        * jnp.sum(vpair_lr * pair.T)
            if exxdiv == "ewald":
                # probe-charge madelung under strain: -2x the Ewald
                # energy of one unit charge on the strained lattice
                # (exact for anisotropic strain, unlike a volume-power
                # scaling)
                Lp = images_e(F)
                r2p = jnp.sum(Lp * Lp, axis=-1)
                okp = r2p > 1e-16
                rp = jnp.sqrt(jnp.where(okp, r2p, 1.0))
                ovrl_p = 0.5 * jnp.sum(
                    jnp.where(okp, erfc(ew_eta * rp) / rp, 0.0))
                Gvp = Gve0 @ Finv
                G2p = jnp.sum(Gvp * Gvp, axis=1)
                ewg_p = 0.5 * jnp.sum(jnp.exp(-G2p / (4 * ew_eta**2))
                                      * 4 * np.pi / G2p) / vol
                e_probe = ovrl_p + ewg_p - ew_eta / np.sqrt(np.pi) \
                    - 0.5 * np.pi / (ew_eta**2 * vol)
                mad_eps = hyb * (-2.0 * e_probe)
                if rsh:
                    # traced madelung_omega: 2w/sqrt(pi)
                    #   - (1/vol) sum_{G!=0} 4pi/G^2 e^{-G^2/4w^2}
                    Gml = Gml0 @ Finv
                    G2ml = jnp.sum(Gml * Gml, axis=1)
                    mad_lr_eps = 2 * omega_abs / np.sqrt(np.pi) \
                        - jnp.sum(4 * np.pi / G2ml
                                  * jnp.exp(-0.25 / omega_abs**2 * G2ml)) \
                        / vol
                    mad_eps = mad_eps + (alpha - hyb) * mad_lr_eps
                for dm_s in (dm_a, dm_b):
                    dms = dm_s @ S
                    ex = ex + mad_eps * jnp.sum(dms * dms.T)
            e_k = -0.5 * ex

        # Ewald (traced): real + reciprocal + self/background
        d = (pos[None, :, None, :] - pos[None, None, :, :]
             + images_e(F)[:, None, None, :])
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

        e_pulay = -jnp.sum(w_mat * S)
        return e1 + e_coul + e_xc + e_k + e_nuc + e_pulay

    def images_e(F):
        return Le0 @ F.T

    return energy


def stress_tensor(system, scf_res, xc=None, exxdiv="ewald",
                  return_energy=False):
    """3x3 stress tensor sigma = (1/vol) dE/d eps (symmetrized) for a
    converged Gamma closed-shell SCF."""
    cell = system.cell
    mo_e = np.asarray(scf_res["mo_energy"])
    mo_c = np.asarray(scf_res["mo_coeff"])
    nocc = system.nelec // 2
    dm = jnp.asarray(scf_res["dm"], dtype=jnp.float64)
    c_occ = jnp.asarray(mo_c[:, :nocc])
    w_mat = jnp.asarray(2.0 * (mo_c[:, :nocc] * mo_e[:nocc])
                        @ mo_c[:, :nocc].T)

    e_fn = make_strain_energy_fn(system, xc=xc, exxdiv=exxdiv)
    eps0 = jnp.zeros((3, 3), dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(eps0, 0.5 * dm, 0.5 * dm,
                                         w_mat, c_occ, c_occ)
    g = np.asarray(grad)
    sigma = 0.5 * (g + g.T) / cell.vol
    e_tot = float(val) + float(jnp.sum(w_mat * jnp.asarray(system.S)))
    if return_energy:
        return sigma, e_tot, g
    return sigma


def _stress_from_spin_state(system, xc, exxdiv, dm_a, dm_b, w_mat,
                            mo_a, mo_b, return_energy):
    e_fn = make_strain_energy_fn(system, xc=xc, exxdiv=exxdiv, spin=True)
    eps0 = jnp.zeros((3, 3), dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(eps0, dm_a, dm_b, w_mat,
                                         mo_a, mo_b)
    g = np.asarray(grad)
    sigma = 0.5 * (g + g.T) / system.cell.vol
    e_tot = float(val) + float(jnp.sum(w_mat * jnp.asarray(system.S)))
    if return_energy:
        return sigma, e_tot, g
    return sigma


def ustress_tensor(system, scf_res, xc=None, exxdiv="ewald",
                   return_energy=False):
    """3x3 stress tensor for a converged Gamma UHF/UKS state (canonical
    per-spin Pulay weight W = sum_s C_s eps_s C_s^T over occupieds)."""
    cell = system.cell
    ea, eb = (np.asarray(e) for e in scf_res["mo_energy"])
    ca, cb = (np.asarray(c) for c in scf_res["mo_coeff"])
    nb = (system.nelec - cell.spin) // 2
    na = system.nelec - nb
    dm_a = jnp.asarray(scf_res["dm"][0], dtype=jnp.float64)
    dm_b = jnp.asarray(scf_res["dm"][1], dtype=jnp.float64)
    w_mat = jnp.asarray((ca[:, :na] * ea[:na]) @ ca[:, :na].T
                        + (cb[:, :nb] * eb[:nb]) @ cb[:, :nb].T)
    return _stress_from_spin_state(
        system, xc, exxdiv, dm_a, dm_b, w_mat,
        jnp.asarray(ca[:, :na]), jnp.asarray(cb[:, :nb]), return_energy)


def rostress_tensor(system, scf_res, xc=None, exxdiv="ewald",
                    return_energy=False):
    """3x3 stress tensor for a converged Gamma ROHF/ROKS state
    (non-canonical Pulay weight W = sum_s D_s F_s D_s with the
    converged per-spin Focks — reference pyscf/grad/rohf.py:29)."""
    cell = system.cell
    C = np.asarray(scf_res["mo_coeff"])
    nb = (system.nelec - cell.spin) // 2
    na = system.nelec - nb
    dm_a = jnp.asarray(scf_res["dm"][0], dtype=jnp.float64)
    dm_b = jnp.asarray(scf_res["dm"][1], dtype=jnp.float64)
    fa, fb = (jnp.asarray(f, dtype=jnp.float64) for f in scf_res["fock"])
    w_mat = dm_a @ fa @ dm_a + dm_b @ fb @ dm_b
    return _stress_from_spin_state(
        system, xc, exxdiv, dm_a, dm_b, w_mat,
        jnp.asarray(C[:, :na]), jnp.asarray(C[:, :nb]), return_energy)
