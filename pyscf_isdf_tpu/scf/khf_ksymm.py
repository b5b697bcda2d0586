"""k-point SCF on the irreducible Brillouin zone (KRHF/KRKS with ksymm).

IBZ analog of :mod:`pyscf_isdf_tpu.scf.khf` (reference semantics:
pyscf/pbc/scf/khf_ksymm.py + pyscf/pbc/lib/kpts.py:32,369,441-631): the
density is carried at nk_ibz irreducible k-points with integer weights and
expanded to the full BZ once per cycle via the space-group AO rotations
(:func:`pyscf_isdf_tpu.symm.expand_dm`). Per-iteration savings vs the
full-BZ loop:

  - eigensolves, DIIS state and occupations: nk_ibz instead of nk,
  - the exchange build's band loop: nk_ibz x nk instead of nk x nk
    (both the pair-density FFT engine and the ISDF GEMM engine take a
    ``k1_idx`` subset),
  - J / Vxc matrix elements: assembled at IBZ k only (one shared
    potential on the grid).

The expansion itself is exact (the AO rotation matrices are covariant to
machine precision); residual IBZ-vs-full-BZ energy differences are the
grid's own symmetry-breaking collocation error, which vanishes with mesh
convergence (6e-14 by mesh 28 for gth-szv diamond).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu import symm
from pyscf_isdf_tpu.df import fftdf_k
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf.diis import DIIS
from pyscf_isdf_tpu.scf.khf import KSCFSystem, build_kscf_system  # noqa: F401


def _weighted_occ(mo_e_k, weights, nelec_tot):
    """Fermi filling across weighted IBZ k-points (2 electrons/orbital).

    Exact-count fill in sorted order (a <=fermi threshold overfills on
    a degenerate Fermi level — same guard as occupations.
    exact_count_occ; argsort tie-breaking is deterministic)."""
    e_all = np.hstack(mo_e_k)
    w_all = np.hstack([np.full(len(e), w) for e, w in zip(mo_e_k, weights)])
    order = np.argsort(e_all, kind="stable")
    cum = np.cumsum(2 * w_all[order])
    nfill = int(np.searchsorted(cum, nelec_tot - 1e-9)) + 1
    if abs(cum[nfill - 1] - nelec_tot) > 1e-9:
        # the last orbital's IBZ weight overshoots the remaining
        # electron count — a metal/fractional filling this integer-fill
        # driver cannot represent; fail loudly instead of converging a
        # wrong-charge state
        raise ValueError(
            f"IBZ integer filling impossible: cumulative weighted "
            f"occupancy jumps {cum[nfill - 2] if nfill > 1 else 0.0} -> "
            f"{cum[nfill - 1]} across nelec_tot={nelec_tot}; use the "
            f"full-BZ driver or smearing")
    mask = np.zeros(e_all.size)
    mask[order[:nfill]] = 2.0
    out = []
    off = 0
    for e in mo_e_k:
        out.append(mask[off:off + len(e)])
        off += len(e)
    return out


def kscf_ibz_kernel(
    system: KSCFSystem,
    info: Optional[symm.IBZInfo] = None,
    xc: Optional[str] = None,
    exxdiv: str = "ewald",
    max_cycle: int = 60,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    isdf_precision: Optional[str] = None,
    sigma: float = 0.0,
    smearing_method: str = "fermi",
    verbose: bool = False,
):
    """Run the IBZ k-point SCF. xc=None -> KRHF, else KRKS.

    ``system`` must be built on the FULL k-point set (the one-time setup
    keeps full-BZ AO values for the exchange sum); the iteration state
    lives on the IBZ.

    ``sigma > 0`` enables finite-temperature occupations over the
    WEIGHTED IBZ spectrum (occupations.smearing_occ_ibz — the
    symmetry-reduced chemical-potential search); the result then also
    carries ``entropy``, ``mu`` and ``e_free`` in the same conventions
    as the full-BZ driver.
    """
    if isdf_precision is not None:
        if isdf_precision != "dd":
            raise ValueError(f"unknown isdf_precision {isdf_precision!r}")
        if df != "isdf":
            raise ValueError(
                "isdf_precision='dd' needs the ISDF engine (df='isdf'); "
                f"got df={df!r}")
    cell = system.cell
    nk = len(system.kpts)
    if info is None:
        info = symm.make_kpts_ibz(cell, system.kpts)
    ibz = tuple(int(i) for i in info.ibz_idx)
    nki = len(ibz)
    w = info.weights

    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad_add = hyb * system.madelung
    if rsh:
        from pyscf_isdf_tpu.ops import coulomb as _coulomb

        mad_add = hyb * system.madelung \
            + (alpha - hyb) * _coulomb.madelung_omega(cell, system.kpts,
                                                      omega)

    aoR_k = system.aoR_k
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)
    nelec_tot = system.nelec_tot

    ao_grad_k = None
    ao_grad_i = None
    if is_gga:
        from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft_k

        coords = jnp.asarray(cell.uniform_grid())
        Gv = jnp.asarray(cell.get_Gv())
        # gradients at every k: grad rho must use the same product rule as
        # the full-BZ kernel or parity is limited by aliasing (~1e-5)
        ao_grad_k = jnp.stack([
            ao_gradient_fft_k(aoR_k[k], mesh, Gv,
                              jnp.asarray(system.kpts[k]), coords)
            for k in range(nk)
        ])  # (nk, 3, ng, nao)
        ao_grad_i = ao_grad_k[jnp.asarray(ibz)]

    # exchange engine over the full density k2, band k1 restricted to IBZ
    if df not in ("fftdf", "isdf"):
        raise ValueError(f"unknown df engine {df!r}: use 'fftdf' or 'isdf'")
    get_k_ibz = None
    if need_k:
        if df == "isdf":
            from pyscf_isdf_tpu.df import isdf_k as isdf_k_mod

            isdfk = isdf_k_mod.build_isdf_k(
                cell, aoR_k, system.kpts, c=isdf_c,
                exxdiv=(exxdiv if exxdiv not in (None, "ewald") else None),
                precision=isdf_precision)
            if rsh:
                isdfk_lr = isdf_k_mod.build_isdf_k(
                    cell, aoR_k, system.kpts, c=isdf_c, omega=omega,
                    precision=isdf_precision)

                def get_k_ibz(dm_full):
                    dmj = jnp.asarray(dm_full, aoR_k.dtype)
                    return hyb * isdf_k_mod.get_k_kpts(
                        isdfk, dmj, k1_idx=ibz) \
                        + (alpha - hyb) * isdf_k_mod.get_k_kpts(
                            isdfk_lr, dmj, k1_idx=ibz)
            else:
                def get_k_ibz(dm_full):
                    return hyb * isdf_k_mod.get_k_kpts(
                        isdfk, jnp.asarray(dm_full, aoR_k.dtype),
                        k1_idx=ibz)
        else:
            if exxdiv not in (None, "ewald"):
                cp, _ = fftdf_k.make_k_kernels(cell, system.kpts, exxdiv=exxdiv)
                coulG_pairs = jnp.asarray(cp)
            else:
                coulG_pairs = jnp.asarray(system.coulG_pairs)
            coulG_pairs_lr = None
            if rsh:
                cpl, _ = fftdf_k.make_k_kernels(cell, system.kpts,
                                                omega=omega)
                coulG_pairs_lr = jnp.asarray(cpl)
            expmikr = jnp.asarray(system.expmikr, dtype=aoR_k.dtype)
            kweight = weight / nk

            def get_k_ibz(dm_full):
                dmj = jnp.asarray(dm_full, aoR_k.dtype)
                vk = hyb * fftdf_k.get_k_kpts(
                    aoR_k, dmj, coulG_pairs, expmikr, mesh, kweight,
                    k1_idx=ibz) if hyb != 0 else 0.0
                if rsh:
                    vk = vk + (alpha - hyb) * fftdf_k.get_k_kpts(
                        aoR_k, dmj, coulG_pairs_lr, expmikr, mesh,
                        kweight, k1_idx=ibz)
                return vk

    S_i = system.S[list(ibz)]
    h_i = system.hcore[list(ibz)]
    X_i = [system.X[k] for k in ibz]
    aoR_i = aoR_k[jnp.asarray(ibz)]

    def eig_all(F_k):
        es, cs = [], []
        for k in range(nki):
            Fp = X_i[k].conj().T @ F_k[k] @ X_i[k]
            e, u = np.linalg.eigh(Fp)
            es.append(e)
            cs.append(X_i[k] @ u)
        return es, cs

    entropy = 0.0
    mu = 0.0

    def fill(mo_e):
        nonlocal entropy, mu
        if sigma and sigma > 0:
            from pyscf_isdf_tpu.scf.occupations import smearing_occ_ibz
            occs, entropy, mu = smearing_occ_ibz(
                mo_e, w, nelec_tot, sigma, smearing_method)
            return occs
        return _weighted_occ(mo_e, w, nelec_tot)

    mo_e, mo_c = eig_all(h_i)
    occs = fill(mo_e)
    dm_i = np.stack([(c * o) @ c.conj().T for c, o in zip(mo_c, occs)])

    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False

    for it in range(max_cycle):
        dm_full = symm.expand_dm(cell, info, dm_i)
        dmj_full = jnp.asarray(dm_full, aoR_k.dtype)
        vj_i = np.asarray(
            fftdf_k.get_j_kpts(aoR_k, dmj_full, coulG, mesh, weight,
                               k_idx=ibz), dtype=np.complex128)
        veff = vj_i.copy()
        e_xc = 0.0
        if xcspec is not None:
            # total density from the full-BZ expansion (exactly the
            # full-BZ quadrature); Vxc matrix elements at IBZ k only
            t_full = jnp.einsum("kgi,kij->kgj", aoR_k, dmj_full)
            rho = jnp.einsum("kgj,kgj->g", t_full, aoR_k.conj()).real / nk
            rho_j = jnp.maximum(rho, 1e-30)
            ao_i = aoR_i
            if is_gga:
                grho = 2.0 / nk * jnp.einsum(
                    "kgj,kxgj->xg", t_full.conj(), ao_grad_k).real  # (3, ng)
                sigma_g = jnp.maximum(jnp.sum(grho * grho, axis=0), 1e-30)
                exc, vrho, vsigma = xcspec.exc_vxc(rho_j, sigma_g)
                e_xc = float(weight * jnp.sum(rho_j * exc))
                aow = 0.5 * vrho[:, None] * ao_i + 2.0 * jnp.einsum(
                    "xg,g,kxgi->kgi", grho, vsigma, ao_grad_i)
                half = weight * jnp.einsum("kgi,kgj->kij", ao_i.conj(), aow)
                vxc = np.asarray(half + half.conj().transpose(0, 2, 1))
            else:
                exc, vrho, _ = xcspec.exc_vxc(rho_j)
                e_xc = float(weight * jnp.sum(rho_j * exc))
                vxc = np.asarray(
                    weight * jnp.einsum("kgi,g,kgj->kij", ao_i.conj(), vrho, ao_i))
            veff += vxc
        e_k = 0.0
        if need_k:
            vk_i = np.array(get_k_ibz(dm_full), dtype=np.complex128)
            if exxdiv == "ewald":
                for k in range(nki):
                    vk_i[k] += mad_add * (S_i[k] @ dm_i[k] @ S_i[k])
            veff -= 0.5 * vk_i
            e_k = -0.25 * np.einsum(
                "k,kij,kji->", w, dm_i, vk_i).real / nk

        F = h_i + veff
        err = np.concatenate([
            (X_i[k].conj().T
             @ (S_i[k] @ dm_i[k] @ F[k] - F[k] @ dm_i[k] @ S_i[k])
             @ X_i[k]).ravel()
            for k in range(nki)
        ])
        F = diis.update(F, err)

        mo_e, mo_c = eig_all(F)
        occs = fill(mo_e)
        dm_new = np.stack([(c * o) @ c.conj().T for c, o in zip(mo_c, occs)])

        e1 = np.einsum("k,kij,kji->", w, dm_i, h_i).real / nk
        ecoul = 0.5 * np.einsum("k,kij,kji->", w, dm_i, vj_i).real / nk
        e_tot = float(e1 + ecoul + e_xc + e_k + system.e_nuc)
        de = abs(e_tot - e_last)
        err_norm = np.linalg.norm(err) / max(1, err.size) ** 0.5
        if verbose:
            print(f"cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}  "
                  f"|err| = {err_norm:.2e}")
        if de < conv_tol and err_norm < np.sqrt(conv_tol):
            conv = True
            dm_i = dm_new
            break
        dm_i = dm_new
        e_last = e_tot

    return {
        "e_tot": e_tot,
        "mo_energy": mo_e,
        "mo_coeff": mo_c,
        "mo_occ": occs,
        "dm": dm_i,
        "dm_full": symm.expand_dm(cell, info, dm_i),
        "converged": conv,
        "niter": it + 1,
        "ibz": info,
        "entropy": entropy,
        "mu": mu,
        "e_free": e_tot - sigma * entropy if sigma else e_tot,
    }
