"""THC-MP2: tensor-hypercontraction MP2 through the ISDF factorization.

BASELINE config 5: the ISDF build gives exactly the THC form of the ERIs

    (ia|jb) ~= sum_PQ X_iP X_aP W_PQ X_jQ X_bQ,   X = C^T aoRg

so the MP2 energy never materializes the O(N^4) oovv tensor from the grid:
only (nocc x n_IP) / (nvir x n_IP) collocations and n_IP^2 kernels flow
through MXU GEMMs (spec: Lu-Ying ISDF; SURVEY.md section 7.5). The energy
assembly here materializes (ia|jb) blockwise per occupied pair i — memory
O(nocc nvir n_IP + nvir^2).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.isdf import ISDF


def thc_mp2_energy(isdf: ISDF, mo_coeff, mo_energy, nocc: int) -> float:
    """MP2 correlation energy from THC/ISDF factors.

    Args:
        isdf: built Gamma-point ISDF factorization (aoRg, W).
        mo_coeff: (nao, nmo) converged RHF orbitals.
        mo_energy: (nmo,) orbital energies (SCF convention, exxdiv included).
    """
    mo_c = jnp.asarray(mo_coeff, isdf.aoRg.dtype)
    Xg = isdf.aoRg @ mo_c                       # (nip, nmo) MO values at IPs
    Xo, Xv = Xg[:, :nocc], Xg[:, nocc:]
    W = isdf.W
    e_o = jnp.asarray(mo_energy[:nocc], isdf.aoRg.dtype)
    e_v = jnp.asarray(mo_energy[nocc:], isdf.aoRg.dtype)

    # Z^{ij}_{ab} = sum_PQ (X_iP X_aP) W_PQ (X_jQ X_bQ): build per (i, j)
    # as (nvir, nvir) = (Xv^T diag(Xo_i) W diag(Xo_j) Xv)
    def pair_energy(i, j):
        Li = (Xo[:, i][:, None] * Xv)           # (nip, nvir)
        Lj = (Xo[:, j][:, None] * Xv)
        v_ab = Li.T @ W @ Lj                    # (ia|jb) for fixed i,j
        denom = (e_o[i] + e_o[j])[None, None] - e_v[:, None] - e_v[None, :]
        t = v_ab / denom
        return jnp.sum(t * (2 * v_ab - v_ab.T))

    nocc_ = int(nocc)
    idx = jnp.arange(nocc_)
    ii, jj = jnp.meshgrid(idx, idx, indexing="ij")
    energies = jax.vmap(pair_energy)(ii.ravel(), jj.ravel())
    return float(jnp.sum(energies))


def thc_kmp2_energy(system, kscf_res, isdfk, nocc=None) -> float:
    """k-point THC-MP2: KMP2 with ERIs from the k-ISDF factors.

    (i ki, a ka | j kj, b kb) ~= sum_PQ conj(u_i(P)) u_a(P)
        conj(W_q[P,Q]) conj(u_j(Q)) u_b(Q),  q = ka - ki
    (same W_q kernels the exchange build uses) — no grid-sized transforms
    in the MP2 assembly at all, only n_IP-sized GEMMs.
    """
    import numpy as np
    from pyscf_isdf_tpu.kpts_helper import get_kconserv

    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    mo_e = kscf_res["mo_energy"]
    mo_c = kscf_res["mo_coeff"]
    if nocc is None:
        nocc = cell.nelectron // 2
    nmo = mo_c[0].shape[1]
    nvir = nmo - nocc
    kconserv = get_kconserv(cell.a, kpts)

    cdt = isdfk.Ug.dtype
    Uo = jnp.stack([isdfk.Ug[k] @ jnp.asarray(mo_c[k][:, :nocc], cdt)
                    for k in range(nk)])          # (nk, nip, no)
    Uv = jnp.stack([isdfk.Ug[k] @ jnp.asarray(mo_c[k][:, nocc:], cdt)
                    for k in range(nk)])          # (nk, nip, nv)
    e_o = [np.asarray(mo_e[k][:nocc]) for k in range(nk)]
    e_v = [np.asarray(mo_e[k][nocc:]) for k in range(nk)]

    def pair_factor(ki, ka):
        # A[P, ia] = conj(u_i(P)) u_a(P)
        return (Uo[ki].conj()[:, :, None] * Uv[ka][:, None, :]).reshape(
            isdfk.n_ip, -1)

    # second-pair reciprocal-lattice offsets G = kb - kj + q need phased
    # kernel variants (see df/isdf_k.w_phased)
    from pyscf_isdf_tpu.df.isdf_k import w_phased

    w_cache = {}

    def kernel_for(ki, ka, kj, kb):
        q = kpts[ka] - kpts[ki]
        G = kpts[kb] - kpts[kj] + q
        if np.linalg.norm(G) < 1e-8:
            return isdfk.Wq[isdfk.qmap[ka, ki]].conj()
        key = (isdfk.qmap[ka, ki], tuple(np.round(G, 8)))
        if key not in w_cache:
            w_cache[key] = w_phased(isdfk, cell, q, G, kpts=kpts)
        return w_cache[key]

    emp2 = 0.0
    for ki in range(nk):
        for kj in range(nk):
            oovv = {}
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                A = pair_factor(ki, ka)
                B = pair_factor(kj, kb)
                W = kernel_for(ki, ka, kj, kb)
                eri = A.T @ W @ B                 # (no*nv, no*nv)
                oovv[ka] = (np.asarray(eri).reshape(nocc, nvir, nocc, nvir)
                            .transpose(0, 2, 1, 3) / nk)
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                eia = e_o[ki][:, None] - e_v[ka]
                ejb = e_o[kj][:, None] - e_v[kb]
                eijab = eia[:, None, :, None] + ejb[None, :, None, :]
                t2 = np.conj(oovv[ka] / eijab)
                emp2 += np.einsum("ijab,ijab->", t2, oovv[ka]).real * 2
                emp2 -= np.einsum("ijab,ijba->", t2, oovv[kb]).real
    return float(emp2 / nk)
