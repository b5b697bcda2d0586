"""Restricted open-shell SCF (ROHF / ROKS) at the Gamma point.

Roothaan single-Fock construction (reference semantics: pyscf/scf/rohf.py):
alpha/beta Fock matrices from the UHF-style veff, combined into the
effective Fock

    R = Fc + projector-coupled open-shell blocks,
    Fc = (Fa + Fb)/2;  R_co = Fb, R_ov = Fa  (canonical Roothaan coupling)

so doubly-occupied, singly-occupied and virtual spaces share one orbital
set. Energy is the UHF expression evaluated with the shared orbitals.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf.diis import DIIS
from pyscf_isdf_tpu.scf.hf import SCFSystem
from pyscf_isdf_tpu.scf.uhf import _spin_vxc


def rohf_kernel(
    system: SCFSystem,
    xc: Optional[str] = None,
    exxdiv: str = "ewald",
    nelec: Optional[tuple] = None,
    max_cycle: int = 100,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    verbose: bool = False,
    xc_grids: str = "uniform",
):
    """Run ROHF (xc=None) or ROKS (LDA/GGA) to convergence.

    df='isdf' routes the per-spin exchange through the ISDF GEMM path.
    """
    cell = system.cell
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0

    if nelec is None:
        na = (cell.nelectron + cell.spin) // 2
        nb = cell.nelectron - na
    else:
        na, nb = nelec
    assert na >= nb

    aoR = system.aoR
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)
    S, hcore, X = system.S, system.hcore, system.X

    ao_grad = None
    if xcspec is not None and xcspec.family == "gga":
        from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft

        ao_grad = ao_gradient_fft(aoR, mesh, jnp.asarray(system.Gv, aoR.dtype))

    # XC-quadrature seam (opt-in Becke atomic grids, ops/becke.py) —
    # _spin_vxc takes scalar or per-point weights, so only arrays swap
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
            cell, bg.coords, dtype=aoR.dtype,
            need_grad=xcspec.family == "gga")
        xc_w = jnp.asarray(bg.weights, dtype=aoR.dtype)
    elif xc_grids != "uniform" and not xc_grids.startswith("becke"):
        raise ValueError(f"unknown xc_grids {xc_grids!r} "
                         "(expected 'uniform' or 'becke[:n_rad,n_theta]')")

    if df not in ("fftdf", "isdf"):
        raise ValueError(f"unknown df engine {df!r}: use 'fftdf' or 'isdf'")
    # RSH (scf/hf.py:172-181 semantics): K_eff = hyb*K_full +
    # (alpha-hyb)*K_LR(omega); each part carries its own madelung.
    coulG_lr = None
    mad_add = hyb * system.madelung
    if rsh:
        from pyscf_isdf_tpu.ops import coulomb as _coulomb

        coulG_lr = jnp.asarray(
            _coulomb.get_coulG(cell, exxdiv=None, omega=omega))
        mad_add = hyb * system.madelung \
            + (alpha - hyb) * _coulomb.madelung_omega(cell, None, omega)
    if df == "isdf" and need_k:
        from pyscf_isdf_tpu.df import isdf as isdf_mod

        if rsh:
            isdf, isdf_lr = isdf_mod.build_isdf_multi(
                aoR, [coulG, coulG_lr], mesh, weight, c=isdf_c)

            def get_k(dm_s):
                dmj = jnp.asarray(dm_s, aoR.dtype)
                return hyb * isdf_mod.get_k(isdf, dmj) \
                    + (alpha - hyb) * isdf_mod.get_k(isdf_lr, dmj)
        else:
            isdf = isdf_mod.build_isdf(aoR, coulG, mesh, weight, c=isdf_c)

            def get_k(dm_s):
                return hyb * isdf_mod.get_k(isdf,
                                            jnp.asarray(dm_s, aoR.dtype))
    else:
        def get_k(dm_s):
            dmj = jnp.asarray(dm_s, aoR.dtype)
            vk = hyb * fftdf.get_k(aoR, dmj, coulG, mesh, weight) \
                if hyb != 0 else 0.0
            if rsh:
                vk = vk + (alpha - hyb) * fftdf.get_k(aoR, dmj, coulG_lr,
                                                      mesh, weight)
            return vk

    def eig(F):
        Fp = X.T @ F @ X
        e, u = np.linalg.eigh(Fp)
        return e, X @ u

    mo_e, mo_c = eig(hcore)
    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False

    for it in range(max_cycle):
        Ca = mo_c[:, :na]
        Cb = mo_c[:, :nb]
        dm_a = Ca @ Ca.T
        dm_b = Cb @ Cb.T
        dm_t = dm_a + dm_b

        vj = np.asarray(fftdf.get_j(aoR, jnp.asarray(dm_t, aoR.dtype), coulG,
                                    mesh, weight), dtype=np.float64)
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
            vka = np.asarray(get_k(dm_a), dtype=np.float64)
            vkb = np.asarray(get_k(dm_b), dtype=np.float64)
            if exxdiv == "ewald":
                vka = vka + mad_add * (S @ dm_a @ S)
                vkb = vkb + mad_add * (S @ dm_b @ S)
            veff_a -= vka
            veff_b -= vkb
            e_k = -0.5 * (np.einsum("ij,ji->", dm_a, vka)
                          + np.einsum("ij,ji->", dm_b, vkb))

        Fa = hcore + veff_a
        Fb = hcore + veff_b
        Fc = 0.5 * (Fa + Fb)

        # Roothaan effective Fock (reference formula: pyscf/scf/rohf.py
        # get_roothaan_fock): projectors P = dm.S, half-weighted diagonal
        # blocks, Fb coupling core<->open, Fa coupling open<->virtual
        Pc = dm_b @ S
        Po = (dm_a - dm_b) @ S
        Pv = np.eye(len(S)) - dm_a @ S
        R = (
            0.5 * (Pc.T @ Fc @ Pc + Po.T @ Fc @ Po + Pv.T @ Fc @ Pv)
            + Po.T @ Fb @ Pc
            + Po.T @ Fa @ Pv
            + Pv.T @ Fc @ Pc
        )
        R = R + R.T

        err = X.T @ (S @ dm_t @ R - R @ dm_t @ S) @ X
        R = diis.update(R, err)
        mo_e, mo_c = eig(R)

        e_elec = (
            np.einsum("ij,ji->", dm_t, hcore)
            + 0.5 * np.einsum("ij,ji->", dm_t, vj)
            + e_xc + e_k
        )
        e_tot = float(e_elec + system.e_nuc)
        de = abs(e_tot - e_last)
        if verbose:
            print(f"cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}")
        if de < conv_tol and np.linalg.norm(err) / err.size**0.5 < np.sqrt(conv_tol):
            conv = True
            break
        e_last = e_tot

    return {
        "e_tot": e_tot,
        "mo_energy": mo_e,
        "mo_coeff": mo_c,
        "dm": (dm_a, dm_b),
        # converged per-spin Fock matrices (NOT the Roothaan effective
        # Fock): the ROHF nuclear-gradient Pulay weight is the
        # non-canonical W = sum_s D_s F_s D_s (reference
        # pyscf/grad/rohf.py:29 make_rdm1e)
        "fock": (Fa, Fb),
        "converged": conv,
        "niter": it + 1,
    }
