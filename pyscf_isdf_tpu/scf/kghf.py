"""k-point generalized Hartree-Fock (KGHF): 2-component spinor orbitals.

Reference semantics: pyscf/pbc/scf/kghf.py — each k-point carries
(2 nao)-dimensional spinor MOs; the density matrix has the four spin
blocks [[aa, ab], [ba, bb]]. Without spin-orbit terms (none in the
reference PBC stack either) the Hamiltonian is spin-diagonal:

  * hcore/overlap: block_diag(h_k, h_k), block_diag(S_k, S_k)
    (kghf.py get_hcore/get_ovlp);
  * J from the charge density D_aa + D_bb, replicated on both spin
    diagonals;
  * K acts on every spin block separately:
    K^{ss'} = sum (mu sigma | lambda nu) D^{ss'}_{sigma lambda} — the
    same pair-density FFT contraction as KRHF exchange, applied to each
    (possibly non-Hermitian) block (kghf.py get_jk maps get_k_kpts over
    the four blocks);
  * ewald exxdiv: madelung shift with the spinor overlap,
    vk += m * S_sp D S_sp per k (kghf.py get_jk -> _ewald_exxdiv_for_G0);
  * occupations: ONE electron per spinor orbital, global Fermi fill
    across k (kghf.py get_occ).

The energy functional therefore contains UHF (collinear) and KRHF
(closed-shell) as exact special cases — both are tested.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf_k
from pyscf_isdf_tpu.scf import occupations as occupations_mod
from pyscf_isdf_tpu.scf.diis import DIIS


def _spinor(mat_k):
    """block_diag(M_k, M_k) for a (nk, nao, nao) stack."""
    nk, nao, _ = mat_k.shape
    out = np.zeros((nk, 2 * nao, 2 * nao), dtype=mat_k.dtype)
    out[:, :nao, :nao] = mat_k
    out[:, nao:, nao:] = mat_k
    return out


def kghf_kernel(
    system,
    exxdiv: str = "ewald",
    max_cycle: int = 80,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    dm0: Optional[np.ndarray] = None,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    verbose: bool = False,
):
    """Run k-point GHF to convergence.

    Args:
        system: KSCFSystem (spatial AO quantities; spinor structure is
            assembled here).
        dm0: optional (nk, 2nao, 2nao) spinor density initial guess —
            e.g. a collinear KUHF density embedded in the diagonal
            blocks, or a non-collinear guess to escape collinear saddle
            points.
        df: 'fftdf' (exact pair-density FFT exchange) or 'isdf'. ISDF
            exchange is complex-LINEAR in the density matrix with no
            Hermiticity assumption, so the same per-q W factorization
            serves all four (generally non-Hermitian) spinor blocks
            (df/isdf_k.py get_k_kpts).

    Returns a dict with e_tot, mo_energy/mo_coeff (spinor), dm, spin
    expectation values (Sx, Sy, Sz) and convergence info.
    """
    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    aoR_k = system.aoR_k
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)
    nao = system.S.shape[-1]
    nelec = system.nelec_tot  # one electron per occupied spinor orbital

    S_sp = _spinor(system.S)
    h_sp = _spinor(system.hcore)
    X_sp = []
    for k in range(nk):
        Xk = system.X[k]
        nr = Xk.shape[1]
        Z = np.zeros((2 * nao, 2 * nr), dtype=Xk.dtype)
        Z[:nao, :nr] = Xk
        Z[nao:, nr:] = Xk
        X_sp.append(Z)

    coulG_pairs = jnp.asarray(system.coulG_pairs)
    expmikr = jnp.asarray(system.expmikr, dtype=aoR_k.dtype)
    kweight = weight / nk

    if df == "isdf":
        from pyscf_isdf_tpu.df import isdf_k as isdf_k_mod

        isdfk = isdf_k_mod.build_isdf_k(
            cell, aoR_k, kpts, c=isdf_c,
            exxdiv=(exxdiv if exxdiv not in (None, "ewald") else None))

        def get_k_block(blk):
            return isdf_k_mod.get_k_kpts(isdfk, blk)
    elif df == "fftdf":
        def get_k_block(blk):
            return fftdf_k.get_k_kpts(aoR_k, blk, coulG_pairs, expmikr,
                                      mesh, kweight)
    else:
        raise ValueError(f"unknown df engine {df!r}: use 'fftdf' or 'isdf'")

    def get_jk(dm_sp):
        dmj = jnp.asarray(dm_sp, dtype=aoR_k.dtype)
        d_aa = dmj[:, :nao, :nao]
        d_ab = dmj[:, :nao, nao:]
        d_ba = dmj[:, nao:, :nao]
        d_bb = dmj[:, nao:, nao:]
        vj_sc = fftdf_k.get_j_kpts(aoR_k, d_aa + d_bb, coulG, mesh, weight)
        vk_blocks = [get_k_block(blk) for blk in (d_aa, d_ab, d_ba, d_bb)]
        vj = np.zeros((nk, 2 * nao, 2 * nao), dtype=np.complex128)
        vj_np = np.asarray(vj_sc)
        vj[:, :nao, :nao] = vj_np
        vj[:, nao:, nao:] = vj_np
        vk = np.zeros_like(vj)
        vk[:, :nao, :nao] = np.asarray(vk_blocks[0])
        vk[:, :nao, nao:] = np.asarray(vk_blocks[1])
        vk[:, nao:, :nao] = np.asarray(vk_blocks[2])
        vk[:, nao:, nao:] = np.asarray(vk_blocks[3])
        if exxdiv == "ewald":
            m = system.madelung
            for k in range(nk):
                vk[k] += m * (S_sp[k] @ dm_sp[k] @ S_sp[k])
        return vj, vk

    def eig_all(F_k):
        es, cs = [], []
        for k in range(nk):
            Fp = X_sp[k].conj().T @ F_k[k] @ X_sp[k]
            e, u = np.linalg.eigh(Fp)
            es.append(e)
            cs.append(X_sp[k] @ u)
        return es, cs

    def occupations(mo_e):
        # Exactly nelec spinors: the spin-free spinor spectrum is 2x
        # degenerate, so a <=fermi threshold overfills odd electron
        # counts (and the symmetric Fock keeps the wrong charge).
        return occupations_mod.exact_count_occ(mo_e, nelec, scale=1.0)

    def make_dm(mo_c, occs):
        return np.stack([
            (c * o) @ c.conj().T for c, o in zip(mo_c, occs)
        ])

    if dm0 is None:
        mo_e, mo_c = eig_all(h_sp)
        dm = make_dm(mo_c, occupations(mo_e))
    else:
        dm = np.asarray(dm0, dtype=np.complex128)

    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False
    for it in range(max_cycle):
        vj, vk = get_jk(dm)
        F = h_sp + vj - vk
        err = np.stack([
            S_sp[k] @ dm[k] @ F[k] - F[k] @ dm[k] @ S_sp[k]
            for k in range(nk)
        ])
        F = diis.update(F, err)
        mo_e, mo_c = eig_all(F)
        dm_new = make_dm(mo_c, occupations(mo_e))
        e_elec = 0.0
        for k in range(nk):
            e_elec += np.einsum("ij,ji->", dm[k], h_sp[k]).real
            e_elec += 0.5 * np.einsum("ij,ji->", dm[k], vj[k]).real
            e_elec -= 0.5 * np.einsum("ij,ji->", dm[k], vk[k]).real
        e_tot = float(e_elec / nk + system.e_nuc)
        de = abs(e_tot - e_last)
        if verbose:
            print(f"KGHF cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}")
        if de < conv_tol and np.linalg.norm(err) / err.size**0.5 \
                < np.sqrt(conv_tol):
            conv = True
            dm = dm_new
            break
        dm = dm_new
        e_last = e_tot

    # spin expectation values <S> = 1/2 sum_k tr(sigma . D_k S_k) / nk
    sx = sy = sz = 0.0
    for k in range(nk):
        dS = dm[k] @ S_sp[k]
        p_ab = np.trace(dS[:nao, nao:])
        p_ba = np.trace(dS[nao:, :nao])
        sx += 0.5 * (p_ab + p_ba).real
        sy += 0.5 * (1j * (p_ab - p_ba)).real
        sz += 0.5 * (np.trace(dS[:nao, :nao]) -
                     np.trace(dS[nao:, nao:])).real
    return {
        "e_tot": e_tot,
        "mo_energy": mo_e,
        "mo_coeff": mo_c,
        "dm": dm,
        "converged": conv,
        "niter": it + 1,
        "spin": (sx / nk, sy / nk, sz / nk),
    }
