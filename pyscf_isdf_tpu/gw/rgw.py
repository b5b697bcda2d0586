"""Gamma-point G0W0-AC quasiparticle energies and RPA correlation energy.

Reference contract: /root/reference/pyscf/gw/gw_ac.py and the k-point
production code /root/reference/pyscf/pbc/gw/krgw_ac.py (Zhu & Chan,
arXiv:2007.03148): the correlation self-energy is computed on the
imaginary-frequency axis with density-fitted integrals, then analytically
continued to the real axis by a Pade (Thiele reciprocal-difference)
approximant, and the quasiparticle equation is solved by Newton
iteration.  N^4 scaling.

TPU-native redesign (vs krgw_ac.py:289-330's per-frequency Python loop):

* the polarizability Pi(iw) for ALL nw quadrature points is one stacked
  GEMM program — fold the occupied-virtual factor f_w into the DF tensor
  and hit the MXU with a (nw*naux, nov) x (nov, naux) contraction;
* the dielectric solves (1 - Pi)^-1 are a single batched
  ``jnp.linalg.solve`` over the frequency axis;
* the double frequency convolution Sigma(iw') = -1/pi sum_w W(iw) g0 is
  an einsum over (w, m) batches.

Host float64 keeps only the tiny Pade fits (~18 points per orbital) and
scalar Newton solves, matching SURVEY §8's "small Grams on host" stance.

Conventions (must match scf/hf.py's Fock assembly so GW@HF reduces to
identity): the mean-field exchange-correlation matrix is
``v_mf = veff - vj = vxc - 0.5*hyb*vk_ewald`` and the HF exchange on the
same density is ``vx = -0.5*(vk + madelung*S dm S)``.  Both use the
SCF's own exxdiv so (vx - v_mf) vanishes exactly for GW@HF.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.scf import hf as hf_mod
from pyscf_isdf_tpu.scf.hf import _vxc_gga, _vxc_lda, _vxc_mgga
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft
from pyscf_isdf_tpu.df import fftdf


# ------------------------------------------------------------------
# imaginary-axis quadrature (krgw_ac.py:427-441 contract)

def scaled_legendre(nw: int):
    """Gauss-Legendre nodes mapped from [-1,1] to [0,inf) by
    x -> x0 (1+x)/(1-x), x0 = 0.5 (same map as the reference)."""
    x, w = np.polynomial.legendre.leggauss(nw)
    x0 = 0.5
    freqs = x0 * (1.0 + x) / (1.0 - x)
    wts = w * 2.0 * x0 / (1.0 - x) ** 2
    return freqs, wts


# ------------------------------------------------------------------
# batched-frequency self-energy on the imaginary axis

@partial(jax.jit, static_argnames=("nocc",))
def _sigma_iw_batched(Lmo, mo_energy, nocc, freqs, wts, omega_grid, ef):
    """Diagonal Sigma_c(i w') for every MO, all frequencies batched.

    Args:
        Lmo: (naux, nmo, nmo) whitened DF tensor in the MO basis (real).
        omega_grid: (nw_sigma,) imaginary parts of the sigma evaluation
            grid (>= 0; occupied orbitals use -i w', virtuals +i w').
    Returns:
        sigma: (nmo, nw_sigma) complex — occ rows evaluated at
        ef - i w', vir rows at ef + i w' (branch-cut-avoiding split,
        krgw_ac.py:225-232).
    """
    naux, nmo, _ = Lmo.shape
    e = mo_energy
    eia = e[:nocc, None] - e[None, nocc:]              # (nocc, nvir) < 0
    Lov = Lmo[:, :nocc, nocc:].reshape(naux, -1)       # (naux, nov)

    # Pi(iw) = 4 sum_ia L_Pia f_w,ia L_Qia   (spin factor 4, nkpts=1)
    f = eia.reshape(-1)[None, :] / (freqs[:, None] ** 2
                                    + eia.reshape(-1)[None, :] ** 2)
    Lf = Lov[None, :, :] * f[:, None, :]               # (nw, naux, nov)
    Pi = 4.0 * jnp.einsum("wPx,Qx->wPQ", Lf, Lov)

    eye = jnp.eye(naux, dtype=Lmo.dtype)
    # (eps^-1 - 1) = (1 - Pi)^-1 - 1, batched over frequencies
    eps_inv = jnp.linalg.solve(eye[None] - Pi, jnp.broadcast_to(
        eye, (freqs.shape[0], naux, naux)))
    eps_m1 = eps_inv - eye[None]

    # W_mn(iw) = sum_PQ L_Pmn (eps^-1 - 1)_PQ L_Qmn  (diagonal in n)
    Wmn = jnp.einsum("Pmn,wPQ,Qmn->wmn", Lmo, eps_m1, Lmo)

    # g0 factors: emo_occ[m,u] = -i w_u + ef - e_m ; vir: +i w_u
    emo_occ = -1j * omega_grid[None, :] + ef - e[:, None]   # (nmo, nw_s)
    emo_vir = +1j * omega_grid[None, :] + ef - e[:, None]
    g0_occ = emo_occ[None] / (emo_occ[None] ** 2
                              + (freqs ** 2)[:, None, None])  # (nw,m,u)
    g0_vir = emo_vir[None] / (emo_vir[None] ** 2
                              + (freqs ** 2)[:, None, None])

    wts_c = wts.astype(Wmn.dtype)
    sig_occ = -jnp.einsum("w,wmn,wmu->nu", wts_c, Wmn.astype(g0_occ.dtype),
                          g0_occ) / jnp.pi
    sig_vir = -jnp.einsum("w,wmn,wmu->nu", wts_c, Wmn.astype(g0_vir.dtype),
                          g0_vir) / jnp.pi
    # occupied orbitals take the -iw branch, virtuals the +iw branch
    sel = (jnp.arange(nmo) < nocc)[:, None]
    return jnp.where(sel, sig_occ, sig_vir)


# ------------------------------------------------------------------
# Pade (Thiele reciprocal differences) analytic continuation

def thiele_coefficients(fn: np.ndarray, zn: np.ndarray) -> np.ndarray:
    """Continued-fraction coefficients a_i of the Thiele interpolant
    through (zn, fn).  Standard recursion (J. Low Temp. Phys. 29, 179)."""
    n = len(zn)
    g = np.zeros((n, n), dtype=np.complex128)
    g[:, 0] = fn
    for i in range(1, n):
        g[i:, i] = (g[i - 1, i - 1] - g[i:, i - 1]) \
            / ((zn[i:] - zn[i - 1]) * g[i:, i - 1])
    return g.diagonal().copy()


def pade_eval(z, zn: np.ndarray, a: np.ndarray):
    """Evaluate the Thiele continued fraction at (complex) z."""
    n = len(a)
    x = a[-1] * (z - zn[-2])
    for i in range(n - 2, 0, -1):
        x = a[i] * (z - zn[i - 1]) / (1.0 + x)
    return a[0] / (1.0 + x)


def _pade_fit_points(nw_sigma: int):
    """Reference point selection (krgw_ac.py:521-527): every 6th point
    through the low-frequency region, then every 4th in the tail."""
    if nw_sigma < 2:
        raise ValueError(
            f"nw_sigma={nw_sigma}: Pade fit needs at least 2 self-energy "
            "frequencies; increase the quadrature size nw")
    idx1 = list(range(1, min(40, nw_sigma), 6))
    idx2 = list(range(idx1[-1] + 4, nw_sigma, 4))
    idx = np.array(idx1 + idx2)
    n = (len(idx) // 2) * 2          # Thiele needs an even count
    return idx[:n]


# ------------------------------------------------------------------
# driver

@dataclass
class GWResult:
    qp_energy: np.ndarray        # (nmo,) QP energies (orbs others = KS)
    mo_energy: np.ndarray        # KS eigenvalues
    sigma_x: np.ndarray          # diagonal <p| -0.5 K |p>
    v_mf: np.ndarray             # diagonal <p| veff - vj |p>
    converged: bool
    orbs: np.ndarray
    nocc: int
    qp_weight: np.ndarray | None = None  # Z_p = 1/(1 - dSigma/dw) at
    #                                      the QP pole (NaN outside orbs)


def _mf_potentials(system, res, xc: Optional[str]):
    """Diagonal MO matrix elements of v_mf = veff - vj and of the HF
    exchange on the SCF density (scf/hf.py Fock conventions)."""
    aoR = system.aoR
    mesh, weight = system.mesh, system.weight
    dm = jnp.asarray(res["dm"], aoR.dtype)
    C = np.asarray(res["mo_coeff"])

    coulG = jnp.asarray(system.coulG)
    vk = np.asarray(fftdf.get_k(aoR, dm, coulG, mesh, weight),
                    dtype=np.float64)
    S = system.S
    vk_ew = vk + system.madelung * (S @ np.asarray(res["dm"]) @ S)
    vx_ao = -0.5 * vk_ew

    v_mf_ao = np.zeros_like(vx_ao)
    if xc is not None:
        spec = XCSpec(xc)
        if spec.family == "mgga":
            ao_grad = ao_gradient_fft(aoR, mesh,
                                      jnp.asarray(system.Gv, aoR.dtype))
            _, vxc, _ = _vxc_mgga(aoR, ao_grad, dm, weight, spec, mesh)
        elif spec.family == "gga":
            ao_grad = ao_gradient_fft(aoR, mesh,
                                      jnp.asarray(system.Gv, aoR.dtype))
            _, vxc, _ = _vxc_gga(aoR, ao_grad, dm, weight, spec, mesh)
        else:
            _, vxc, _ = _vxc_lda(aoR, dm, weight, spec, mesh)
        v_mf_ao += np.asarray(vxc, dtype=np.float64)
        if spec.omega != 0.0:
            # RSH (scf/hf.py kernel semantics, reference
            # pbc/dft/rks.py:108-121): the mean field's exchange is
            #   K_eff = hyb*K_full + (alpha-hyb)*K_LR(omega),
            # each part with its own probe-charge madelung.  GW's
            # Sigma_x stays the FULL-range vx_ao above — (Sigma_x -
            # v_mf) is then exactly the missing LR exchange plus the
            # semilocal correction, so GW@HSE06 reduces to GW@PBE0 in
            # the omega->0 limit.
            from pyscf_isdf_tpu.ops import coulomb

            coulG_lr = jnp.asarray(coulomb.get_coulG(
                system.cell, exxdiv=None, omega=spec.omega), aoR.dtype)
            vk_lr = np.asarray(fftdf.get_k(aoR, dm, coulG_lr, mesh,
                                           weight), dtype=np.float64)
            mad_lr = coulomb.madelung_omega(system.cell, None, spec.omega)
            vx_lr = -0.5 * (vk_lr + mad_lr * (S @ np.asarray(res["dm"]) @ S))
            v_mf_ao += spec.hyb * vx_ao + (spec.alpha - spec.hyb) * vx_lr
        elif spec.hyb > 0:
            v_mf_ao += spec.hyb * vx_ao
    else:
        v_mf_ao += vx_ao        # HF: v_mf IS the exchange

    vx_mo = np.einsum("ip,ij,jp->p", C, vx_ao, C)
    v_mf_mo = np.einsum("ip,ij,jp->p", C, v_mf_ao, C)
    return vx_mo, v_mf_mo


def build_lmo(system, mo_coeff, beta: float = 2.0, l_extra: int = 2,
              g=None):
    """Whitened Gamma-point DF tensor in the MO basis:
    (ia|jb) = sum_P Lmo[P,i,a] Lmo[P,j,b]  (df/gdf.py G-space build).

    Pass a prebuilt ``g`` (GDF) to share the cell-only AO-basis fit
    across several MO transforms (the spin channels of ugw/urpa)."""
    from pyscf_isdf_tpu.df import gdf as gdf_mod

    if g is None:
        g = gdf_mod.build_gdf(system.cell, system.aoR,
                              jnp.asarray(system.coulG),
                              system.mesh, system.weight, beta=beta,
                              l_extra=l_extra)
    C = jnp.asarray(mo_coeff, g.cderi.dtype)
    return jnp.einsum("pij,ia,jb->pab", g.cderi, C, C)


def gw_ac_gamma(system, res, xc: Optional[str] = None, nw: int = 100,
                orbs=None, linearized: bool = False,
                Lmo: Optional[jnp.ndarray] = None,
                eta: float = 1e-6,
                mo_energy_gw=None) -> GWResult:
    """G0W0-AC on a converged Gamma-point SCF result dict.

    Args:
        system: SCFSystem (scf/hf.py).
        res: scf_kernel result dict (mo_energy/mo_coeff/dm).
        xc: the functional the SCF ran with (None = HF) — sets v_mf.
        Lmo: optional precomputed (naux, nmo, nmo) MO DF tensor (tests
            pass the same tensor to the exact oracle to cancel DF error).
        mo_energy_gw: optional eigenvalues used inside G and W (the
            evGW feedback); the QP equation ALWAYS uses the mean-field
            res["mo_energy"] as its reference — feeding updated
            energies into the reference term double-counts the
            correction and diverges (measured: +0.38 Ha/iteration).
    """
    mo_energy = np.asarray(res["mo_energy"], dtype=np.float64)
    e_gw = (mo_energy if mo_energy_gw is None
            else np.asarray(mo_energy_gw, dtype=np.float64))
    nmo = mo_energy.shape[0]
    nocc = system.nelec // 2
    if orbs is None:
        orbs = np.arange(nmo)
    orbs = np.asarray(orbs)

    if e_gw[nocc] - e_gw[nocc - 1] < 1e-3:
        raise ValueError("GW-AC does not support metallic (gapless) "
                         "references (same posture as krgw_ac.py:221)")
    ef = 0.5 * (e_gw[nocc - 1] + e_gw[nocc])

    if Lmo is None:
        Lmo = build_lmo(system, res["mo_coeff"])

    freqs, wts = scaled_legendre(nw)
    iw_cutoff = 5.0
    nw_sigma = int(np.sum(freqs < iw_cutoff)) + 1
    omega_grid = np.zeros(nw_sigma)
    omega_grid[1:] = freqs[: nw_sigma - 1]

    sigma = np.asarray(_sigma_iw_batched(
        Lmo, jnp.asarray(e_gw), nocc, jnp.asarray(freqs),
        jnp.asarray(wts), jnp.asarray(omega_grid), ef))

    vx_mo, v_mf_mo = _mf_potentials(system, res, xc)

    # Pade continuation per orbital (host, float64)
    fit = _pade_fit_points(nw_sigma)
    qp = mo_energy.copy()
    zfac = np.full(nmo, np.nan)
    conv = True
    from scipy.optimize import newton

    for p in orbs:
        sgn = -1.0 if p < nocc else 1.0
        zn = 1j * sgn * omega_grid[fit]
        a = thiele_coefficients(sigma[p, fit], zn)

        def sigma_real(w, zn=zn, a=a):
            return pade_eval(w - ef, zn, a).real

        def qp_eq(w, p=p, sigma_real=sigma_real):
            return w - mo_energy[p] - (sigma_real(w)
                                       + vx_mo[p] - v_mf_mo[p])

        if linearized:
            de = 1e-6
            s0 = sigma_real(mo_energy[p])
            z = 1.0 / (1.0 - (sigma_real(mo_energy[p] + de) - s0) / de)
            qp[p] = mo_energy[p] + z * (s0 + vx_mo[p] - v_mf_mo[p])
            zfac[p] = z
        else:
            try:
                qp[p] = newton(qp_eq, mo_energy[p], tol=1e-6, maxiter=100)
            except RuntimeError:
                conv = False
            de = 1e-6
            zfac[p] = 1.0 / (1.0 - (sigma_real(qp[p] + de)
                                    - sigma_real(qp[p] - de)) / (2 * de))
    return GWResult(qp_energy=qp, mo_energy=mo_energy, sigma_x=vx_mo,
                    v_mf=v_mf_mo, converged=conv, orbs=orbs, nocc=nocc,
                    qp_weight=zfac)


def evgw_gamma(system, res, xc: Optional[str] = None, nw: int = 100,
               orbs=None, max_iter: int = 10, conv_tol: float = 1e-5,
               Lmo: Optional[jnp.ndarray] = None, verbose: bool = False):
    """Eigenvalue-self-consistent GW (evGW): iterate G0W0 with the
    quasiparticle eigenvalues fed back into BOTH G and W (orbitals and
    v_mf frozen at the mean-field level) until the QP energies are
    stationary.  Removes most of the G0W0 starting-point dependence —
    the LDA- and HF-started fixed points agree to ~mHa (tested).
    """
    if Lmo is None:
        Lmo = build_lmo(system, res["mo_coeff"])
    last = np.asarray(res["mo_energy"], dtype=np.float64).copy()
    e_gw = last.copy()
    out = None
    for it in range(max_iter):
        out = gw_ac_gamma(system, res, xc=xc, nw=nw, orbs=orbs, Lmo=Lmo,
                          mo_energy_gw=e_gw)
        delta = np.abs(out.qp_energy - last).max()
        if verbose:
            print(f"evGW iter {it}: max|dQP| = {delta:.2e}")
        last = out.qp_energy.copy()
        e_gw = out.qp_energy
        if delta < conv_tol:
            break
    # report against the ORIGINAL mean-field eigenvalues
    return GWResult(qp_energy=out.qp_energy,
                    mo_energy=np.asarray(res["mo_energy"], np.float64),
                    sigma_x=out.sigma_x, v_mf=out.v_mf,
                    converged=out.converged and delta < conv_tol,
                    orbs=out.orbs, nocc=out.nocc,
                    qp_weight=out.qp_weight)


# ------------------------------------------------------------------
# RPA correlation energy (reference pyscf/gw/rpa.py capability)

def rpa_ecorr_gamma(system, res, nw: int = 100,
                    Lmo: Optional[jnp.ndarray] = None) -> float:
    """Direct-RPA correlation energy by imaginary-frequency quadrature:

        Ec = 1/(2 pi) int_0^inf dw  tr[ ln(1 - Pi(iw)) + Pi(iw) ]

    with Pi the same symmetrized polarizability as the GW kernel.
    Validated against the exact plasmon formula Ec = 1/2 (sum_v Omega_v
    - tr A) from the dense dRPA diagonalization (gw_exact.py oracle)."""
    mo_energy = np.asarray(res["mo_energy"], dtype=np.float64)
    nocc = system.nelec // 2
    if Lmo is None:
        Lmo = build_lmo(system, res["mo_coeff"])
    naux, nmo, _ = Lmo.shape
    eia = mo_energy[:nocc, None] - mo_energy[None, nocc:]
    Lov = np.asarray(Lmo[:, :nocc, nocc:]).reshape(naux, -1)

    freqs, wts = scaled_legendre(nw)
    f = eia.reshape(-1)[None, :] / (freqs[:, None] ** 2
                                    + eia.reshape(-1)[None, :] ** 2)
    Pi = 4.0 * jnp.einsum("wx,Px,Qx->wPQ", jnp.asarray(f),
                          jnp.asarray(Lov), jnp.asarray(Lov))
    ev = np.asarray(jnp.linalg.eigvalsh(Pi))      # (nw, naux), all < 1
    integrand = np.sum(np.log(1.0 - ev) + ev, axis=1)
    return float(np.sum(wts * integrand) / (2.0 * np.pi))
