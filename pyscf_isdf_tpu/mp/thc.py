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
