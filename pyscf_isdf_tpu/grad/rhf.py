"""Nuclear gradients (forces) by autodiff through the energy functional.

The reference computes PBC forces with dedicated analytic-derivative
kernels (pyscf/pbc/df/fft_jk.py:111 get_j_e1_kpts, :304 get_k_e1_kpts;
pyscf/grad + lib C gradients). The TPU-native replacement is one
jax.grad: every position-dependent piece of the converged total energy
(AO collocation, G-space S/T phases, GTH local/nonlocal PP structure
factors, Ewald) is a jnp program of the atom positions, so

    dE/dR = grad_R [ E(D0, R) - Tr(W0 * S(R)) ]

evaluated at the SCF stationary point — the second term is the Pulay
(basis-response) contribution with W the energy-weighted density matrix;
D0/W0 are held fixed (Hellmann-Feynman + Pulay is exact at convergence).
Validated against central finite differences of converged SCF energies
(tests/test_grad.py: HF, LDA, PBE, PBE0).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.ops import coulomb, pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import (PackedBasis, eval_ao_positions,
                                        ao_gradient_fft, shell_rcut)
from pyscf_isdf_tpu.ops.ft_ao import ft_ao, converged_st_mesh
from pyscf_isdf_tpu.ops.xc import XCSpec


def _ao_atom_map(cell):
    out = np.empty(cell.nao, dtype=np.int32)
    ao_loc = cell.ao_loc
    for ish, sh in enumerate(cell.shells):
        out[ao_loc[ish]:ao_loc[ish + 1]] = sh.atom
    return out


def _ft_factors(cell, Gv, kpt=None):
    """Position-independent AO FT factors f_i(G): the analytic ft_ao with
    the center phase e^{-i(G+k).A_i} divided out."""
    aoG = ft_ao(cell, Gv, kpt=kpt)
    ao_atom = _ao_atom_map(cell)
    kG = Gv + kpt[None, :] if kpt is not None else Gv
    phase = np.exp(-1j * kG @ cell.coords.T)        # (ng, natm)
    return aoG * phase[:, ao_atom].conj(), ao_atom


class _EwaldData:
    """Static (position-independent) Ewald setup, mirroring
    ops/coulomb.ewald so the traced energy matches the host value."""

    def __init__(self, cell):
        assert cell.dimension == 3, "autodiff Ewald: 3D cells only"
        self.charges = jnp.asarray(cell.charges, dtype=jnp.float64)
        ew_eta, ew_cut = coulomb.ewald_params(cell)
        self.eta = ew_eta
        self.L = jnp.asarray(lattice.lattice_images(cell.a, ew_cut, 3))
        log_prec = np.log(cell.precision
                          / (max(np.abs(cell.charges).sum(), 1.0)
                             * 16 * np.pi**2))
        mesh = lattice.cutoff_to_mesh(cell.a, -2 * ew_eta**2 * log_prec)
        Gv = lattice.get_Gv(cell.a, mesh)
        absG2 = np.einsum("gi,gi->g", Gv, Gv)
        keep = absG2 > 1e-12
        self.Gv = jnp.asarray(Gv[keep])
        self.coulG = jnp.asarray(4 * np.pi / absG2[keep] / cell.vol)
        self.expG2 = jnp.asarray(np.exp(-absG2[keep] / (4 * ew_eta**2)))
        self.self_e = (-0.5 * float(cell.charges @ cell.charges)
                       * 2 * ew_eta / np.sqrt(np.pi)
                       - 0.5 * float(cell.charges.sum()) ** 2 * np.pi
                       / (ew_eta**2 * cell.vol))

    def energy(self, positions):
        q = self.charges
        d = (positions[None, :, None, :] - positions[None, None, :, :]
             + self.L[:, None, None, :])
        r2 = jnp.sum(d * d, axis=-1)
        tiny = r2 < 1e-16
        r = jnp.sqrt(jnp.where(tiny, 1.0, r2))
        ovrl = 0.5 * jnp.sum(q[:, None] * q[None, :]
                             * jnp.where(tiny, 0.0, erfc(self.eta * r) / r))
        ZSI = jnp.sum(q[None, :] * jnp.exp(-1j * self.Gv @ positions.T),
                      axis=1)
        ewg = 0.5 * jnp.sum(jnp.abs(ZSI) ** 2 * self.expG2 * self.coulG)
        return ovrl + ewg + self.self_e


def _vnl_tables(cell):
    """Per-atom nonlocal projector tables (static): list of
    (atom_index, h (nl,nl), pYlm (nl, 2l+1, ng))."""
    Gv = cell.get_Gv(cell.mesh)
    G_rad = np.linalg.norm(Gv, axis=1)
    from pyscf_isdf_tpu.ops.pp import _qli
    from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics

    tables = []
    for ia in range(cell.natm):
        pp = cell.pseudos.get(cell.symbols[ia])
        if pp is None:
            continue
        for l, (rl, h) in enumerate(zip(pp.proj_rl, pp.proj_h)):
            nl = len(h)
            if nl == 0:
                continue
            ang = solid_harmonics(l, Gv, np)
            radial = rl ** (l + 1.5) * np.pi**1.25 \
                * np.exp(-0.5 * (G_rad * rl) ** 2)
            pYlm = np.empty((nl, 2 * l + 1, Gv.shape[0]))
            for i in range(nl):
                pYlm[i] = (ang * (radial * _qli(G_rad * rl, l, i))[:, None]).T
            tables.append((ia, jnp.asarray(np.asarray(h)),
                           jnp.asarray(pYlm)))
    return tables


def make_energy_fn(system, xc=None, exxdiv="ewald"):
    """Build E(positions; D, W, C_occ_weighted) — the converged-density
    energy functional with every position dependence traced."""
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
    is_mgga = xcspec is not None and xcspec.family == "mgga"
    mad = system.madelung if exxdiv == "ewald" else 0.0
    # RSH (LR formulation, scf/hf.py:172-181 semantics): exchange is
    # hyb*Ex_full + (alpha-hyb)*Ex_LR(omega); each part carries its own
    # probe-charge madelung.
    coulG_lr = None
    mad_add = hyb * mad
    if rsh:
        coulG_lr = jnp.asarray(
            coulomb.get_coulG(cell, exxdiv=None, omega=omega))
        mad_lr = coulomb.madelung_omega(cell, None, omega) \
            if exxdiv == "ewald" else 0.0
        mad_add = hyb * mad + (alpha - hyb) * mad_lr

    packed = PackedBasis.from_cell(cell)
    rcut = max(shell_rcut(sh) for sh in cell.shells)
    images = jnp.asarray(lattice.lattice_images(cell.a, rcut, cell.dimension))
    coords = jnp.asarray(cell.uniform_grid())

    # S/T on the ST-converged G mesh (phase-factorized analytic FT)
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
        vnl_tables = _vnl_tables(cell)
        fG_mesh, _ = _ft_factors(cell, cell.get_Gv(cell.mesh))
        fG_mesh = jnp.asarray(fG_mesh)
    else:
        charges = jnp.asarray(cell.charges, dtype=jnp.float64)
    ewald_data = _EwaldData(cell)
    ao_atom_j = jnp.asarray(ao_atom)

    def st(positions):
        ph = jnp.exp(-1j * Gv_stj @ positions.T)          # (ng, natm)
        aoG = fG_st * ph[:, ao_atom_j]
        S = jnp.real(aoG.conj().T @ aoG) / vol
        T = jnp.real((aoG.conj() * (0.5 * G2_st)[:, None]).T @ aoG) / vol
        return S, T

    def energy(positions, dm, w_mat, mo_w):
        aoR = eval_ao_positions(packed, coords, images, positions)
        S, T = st(positions)
        ph_mesh = jnp.exp(-1j * Gv_mesh @ positions.T)    # (ng, natm)

        e1 = jnp.sum(dm * T)
        if has_pp:
            SI = ph_mesh.T                                 # (natm, ng)
            vpplocG = -jnp.sum(SI * vlocG, axis=0)
            vpplocG = vpplocG.at[0].set(alpha0)
            vR = ifft3(vpplocG, mesh).real
            e1 = e1 + jnp.einsum("pq,gp,g,gq->", dm, aoR, vR, aoR)
            aokG = fG_mesh * ph_mesh[:, ao_atom_j] / np.sqrt(vol)
            for ia, h, pYlm in vnl_tables:
                SPG = jnp.einsum("g,img,gp->imp", SI[ia].conj(), pYlm, aokG)
                e1 = e1 + jnp.real(
                    jnp.einsum("imp,ij,jmq,qp->", SPG.conj(), h, SPG, dm)
                ) / vol
        else:
            rhoG = -charges @ ph_mesh.T
            vneR = ifft3(rhoG * coulG, mesh).real
            e1 = e1 + jnp.einsum("pq,gp,g,gq->", dm, aoR, vneR, aoR)

        # Hartree
        t = aoR @ dm
        rho = jnp.sum(t * aoR, axis=-1)
        vG = coulG * fft3(rho.astype(jnp.complex128), mesh)
        vR_h = ifft3(vG, mesh).real
        e_coul = 0.5 * weight * jnp.sum(rho * vR_h)

        # XC
        e_xc = 0.0
        if xcspec is not None:
            if is_gga or is_mgga:
                ao_grad = ao_gradient_fft(aoR, mesh, Gv_mesh.astype(aoR.dtype))
                grad_rho = 2.0 * jnp.einsum("gi,xgi->xg", t, ao_grad)
                sigma = jnp.sum(grad_rho * grad_rho, axis=0)
                if is_mgga:
                    tg = jnp.einsum("xgi,ij->xgj", ao_grad, dm)
                    tau = 0.5 * jnp.einsum("xgj,xgj->g", tg, ao_grad)
                    exc = xcspec._exc(jnp.maximum(rho, 1e-30),
                                      jnp.maximum(sigma, 1e-30),
                                      jnp.maximum(tau, 1e-30))
                else:
                    exc, _, _ = xcspec.exc_vxc(rho, sigma)
            else:
                exc, _, _ = xcspec.exc_vxc(rho)
            e_xc = weight * jnp.sum(rho * exc)

        # exact exchange at fixed occupied MOs (D = mo_w mo_w^T)
        e_k = 0.0
        if need_k:
            moR = aoR @ mo_w                              # (ng, nocc)
            pair = moR[:, :, None] * moR[:, None, :]      # (ng, no, no)
            no = pair.shape[-1]
            pflat = pair.reshape(-1, no * no).T
            pG = fft3(pflat.astype(jnp.complex128), mesh)

            def pair_energy(kern):
                vpair = ifft3(kern[None, :] * pG, mesh).real
                return weight * jnp.sum(vpair * pflat)

            ex = hyb * pair_energy(coulG) if hyb != 0 else 0.0
            if rsh:
                ex = ex + (alpha - hyb) * pair_energy(coulG_lr)
            if exxdiv == "ewald":
                dms = dm @ S
                ex = ex + mad_add * jnp.sum(dms * dms.T)   # Tr(D S D S)
            e_k = -0.25 * ex

        e_pulay = -jnp.sum(w_mat * S)
        return (e1 + e_coul + e_xc + e_k + ewald_data.energy(positions)
                + e_pulay)

    return energy


def rhf_gradient(system, scf_res, xc=None, exxdiv="ewald",
                 return_energy=False):
    """dE_tot/dR (natm, 3) for a converged Gamma closed-shell SCF.

    Forces are -gradient. The Pulay term uses the energy-weighted DM
    W = 2 sum_occ eps_m C_m C_m^T; integer occupations only.
    """
    cell = system.cell
    mo_e = np.asarray(scf_res["mo_energy"])
    mo_c = np.asarray(scf_res["mo_coeff"])
    nocc = system.nelec // 2
    dm = jnp.asarray(scf_res["dm"], dtype=jnp.float64)
    c_occ = mo_c[:, :nocc]
    w_mat = jnp.asarray(2.0 * (c_occ * mo_e[:nocc]) @ c_occ.T)
    mo_w = jnp.asarray(c_occ * np.sqrt(2.0))

    e_fn = make_energy_fn(system, xc=xc, exxdiv=exxdiv)
    pos0 = jnp.asarray(cell.coords, dtype=jnp.float64)
    val, grad = jax.value_and_grad(e_fn)(pos0, dm, w_mat, mo_w)
    # the Pulay term -Tr(W S) evaluated at R0 is a constant offset of the
    # *value* (not the gradient); report the physical total energy
    e_tot = float(val) + float(jnp.sum(w_mat * jnp.asarray(system.S)))
    if return_energy:
        return np.asarray(grad), e_tot
    return np.asarray(grad)
