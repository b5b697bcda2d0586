"""k-point sampled FFT density fitting: J and K at sampled k (device JAX).

Complex Bloch-AO version of :mod:`pyscf_isdf_tpu.df.fftdf` (algorithmic
contract: pyscf/pbc/df/fft_jk.py:33-109 for J, :177-302 for K):

  J: one Poisson solve of the k-averaged density, then per-k quadrature.
  K: double k-loop over (k1, k2) momentum transfers q = k2 - k1 with the
     wrap-around Coulomb kernel coulG(q) and e^{-iq.r} phase factors —
     the O(nao nkpts^2) FFT cost the k-point ISDF engine amortizes.

All per-(k1,k2) constants (coulG(q), expmikr) are precomputed host-side in
float64 and closed over; the k loops are Python loops at trace time.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.ops import coulomb


def _cdtype(dt):
    return jnp.complex128 if dt in (jnp.float64, jnp.complex128) else jnp.complex64


@partial(jax.jit, static_argnames=("mesh", "k_idx"))
def get_j_kpts(aoR_k, dm_k, coulG, mesh, weight, k_idx=None):
    """Coulomb matrices at all k (or at the static subset ``k_idx``).

    Args:
        aoR_k: (nk, ng, nao) complex Bloch AOs.
        dm_k: (nk, nao, nao) density matrices.
        coulG: (ng,) kernel at q=0.
        k_idx: optional tuple of band k indices — the density still sums
            over every k in aoR_k/dm_k, but vj is only assembled at these
            (the IBZ fast path: matrix elements of one shared potential).
    Returns (nk, nao, nao) complex vj (len(k_idx) first axis if given).
    """
    nk = aoR_k.shape[0]
    hi = jax.lax.Precision.HIGHEST   # TPU DEFAULT matmul is bf16
    t = jnp.einsum("kgi,kij->kgj", aoR_k, dm_k, precision=hi)
    rho = jnp.einsum("kgj,kgj->g", t, aoR_k.conj(),
                     precision=hi).real / nk
    cd = _cdtype(aoR_k.dtype)
    vG = coulG * fft3(rho.astype(cd), mesh)
    vR = ifft3(vG, mesh).real
    ao_b = aoR_k if k_idx is None else aoR_k[jnp.asarray(k_idx)]
    return weight * jnp.einsum("kgi,g,kgj->kij", ao_b.conj(), vR, ao_b,
                               precision=hi)


def make_k_kernels(cell, kpts, exxdiv=None, omega=None):
    """Host-precompute per-(k1,k2) Coulomb kernels and phase factors.

    Returns (coulG_pairs (nk,nk,ng) float64, expmikr (nk,nk,ng) complex128)
    with expmikr[k2,k1] = exp(-i (k2-k1).r). exxdiv='ewald' is handled
    post-hoc via the madelung shift, so kernels use exxdiv=None
    (fft_jk.py:267-270 semantics). omega<0 gives the short-range erfc
    kernels for RSH exchange.
    """
    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    coords = cell.uniform_grid()
    ng = coords.shape[0]
    coulG = np.empty((nk, nk, ng))
    expmikr = np.empty((nk, nk, ng), dtype=np.complex128)
    for k2 in range(nk):
        for k1 in range(nk):
            q = kpts[k2] - kpts[k1]
            ex = exxdiv if exxdiv not in ("ewald",) else None
            coulG[k2, k1] = coulomb.get_coulG(cell, k=q, exxdiv=ex, kpts=kpts,
                                              omega=omega)
            expmikr[k2, k1] = np.exp(-1j * coords @ q)
    return coulG, expmikr


@partial(jax.jit, static_argnames=("mesh", "chunk"))
def get_k_band(aoRb, aoR_k, dm_k, coulG_bk, expmikr_bk, mesh, kweight,
               chunk: int = 8):
    """Exchange matrix at ONE band k-point from the converged k-sampled
    density (reference get_bands exchange, pyscf/pbc/scf/khf.py:581 +
    fft_jk kpts_band path).

    Args:
        aoRb: (ng, nao) Bloch AOs at the band k-point.
        aoR_k / dm_k: (nk, ng, nao) / (nk, nao, nao) SCF-set quantities.
        coulG_bk: (nk, ng) kernels coulG(k2 - kb).
        expmikr_bk: (nk, ng) phases exp(-i (k2-kb).r).
        kweight: (1/nk) * vol/ngrids.
    """
    nk, ng, nao = aoR_k.shape
    cd = _cdtype(aoR_k.dtype)
    vk = jnp.zeros((nao, nao), cd)
    npad = (-nao) % chunk
    ao1T = aoRb.T.astype(cd)
    for k2 in range(nk):
        ao2T = aoR_k[k2].T
        ao_dms = dm_k[k2] @ ao2T.conj()
        cG = coulG_bk[k2]
        phase = expmikr_bk[k2].astype(cd)

        def k_chunk(blk):
            rho1 = blk[:, None, :] * ao2T[None, :, :]
            vG = cG[None, None, :] * fft3(rho1, mesh)
            vR = ifft3(vG, mesh)
            return jnp.einsum("ijg,jg->ig", vR, ao_dms)

        blks = jnp.pad(ao1T.conj() * phase[None, :], ((0, npad), (0, 0)))
        vR_dm = jax.lax.map(k_chunk, blks.reshape(-1, chunk, ng))
        vR_dm = vR_dm.reshape(-1, ng)[:nao] * phase.conj()[None, :]
        vk = vk + kweight * (vR_dm @ ao1T.T)
    return vk


@partial(jax.jit, static_argnames=("mesh", "chunk", "k1_idx"))
def get_k_kpts_occ(aoR_k, mo_w_k, coulG_pairs, expmikr, mesh, weight,
                   chunk: int = 8, k1_idx=None):
    """Exchange at all k via occupied-MO pair densities.

    k-point analog of the reference's tagged-DM fast path
    (pyscf/pbc/df/fft_jk.py:235-259): per (k1, k2) block the FFT batch
    is (nao x nocc) instead of (nao x nao).

    Args:
        mo_w_k: (nk, ng, nocc) occupied Bloch MOs on the grid, each
            column scaled by sqrt(occ) — equals K[dm] for
            dm_k = (C_k * occ_k) C_k^H.
    """
    nk, ng, nao = aoR_k.shape
    no = mo_w_k.shape[2]
    k1_list = tuple(range(nk)) if k1_idx is None else tuple(k1_idx)
    cd = _cdtype(aoR_k.dtype)
    vk = {k1: jnp.zeros((nao, nao), cd) for k1 in k1_list}
    npad = (-nao) % chunk

    for k2 in range(nk):
        moT = mo_w_k[k2].T                                   # (no, ng)
        for k1 in k1_list:
            cG = coulG_pairs[k2, k1]
            phase = expmikr[k2, k1].astype(cd)
            ao1T = aoR_k[k1].T

            def k_chunk(blk):                  # (b, ng) of conj(ao1T)*phase
                rho1 = blk[:, None, :] * moT[None, :, :]      # (b, no, ng)
                vG = cG[None, None, :] * fft3(rho1, mesh)
                vR = ifft3(vG, mesh)
                return jnp.einsum("big,ig->bg", vR, moT.conj())

            blks = jnp.pad(ao1T.conj() * phase[None, :], ((0, npad), (0, 0)))
            acc = jax.lax.map(k_chunk, blks.reshape(-1, chunk, ng))
            acc = acc.reshape(-1, ng)[:nao] * phase.conj()[None, :]
            vk[k1] = vk[k1] + weight * (acc @ ao1T.T)
    return jnp.stack([vk[k1] for k1 in k1_list])


def get_k_kpts(aoR_k, dm_k, coulG_pairs, expmikr, mesh, weight, chunk: int = 8,
               k1_idx=None):
    """Exchange matrices at all k (double k-loop pair-density FFTs).

    Args:
        coulG_pairs: (nk, nk, ng) kernels coulG(k2-k1) from make_k_kernels.
        expmikr: (nk, nk, ng) phases exp(-i(k2-k1).r).
        weight: (1/nk) * vol/ngrids.
        k1_idx: optional static tuple restricting the *band* k-points
            (exchange is still summed over every density k2) — the IBZ
            fast path. Output order follows k1_idx.
    """
    nk, ng, nao = aoR_k.shape
    k1_list = tuple(range(nk)) if k1_idx is None else tuple(k1_idx)
    cd = _cdtype(aoR_k.dtype)
    vk = {k1: jnp.zeros((nao, nao), cd) for k1 in k1_list}
    npad = (-nao) % chunk

    for k2 in range(nk):
        ao2T = aoR_k[k2].T                               # (nao, ng)
        ao_dms = dm_k[k2] @ ao2T.conj()                  # (nao, ng)
        for k1 in k1_list:
            cG = coulG_pairs[k2, k1]
            phase = expmikr[k2, k1].astype(cd)
            ao1T = aoR_k[k1].T

            def k_chunk(blk):                            # (b, ng) of conj(ao1T)*phase
                rho1 = blk[:, None, :] * ao2T[None, :, :]
                vG = cG[None, None, :] * fft3(rho1, mesh)
                vR = ifft3(vG, mesh)
                return jnp.einsum("ijg,jg->ig", vR, ao_dms)

            blks = jnp.pad(ao1T.conj() * phase[None, :], ((0, npad), (0, 0)))
            vR_dm = jax.lax.map(k_chunk, blks.reshape(-1, chunk, ng))
            vR_dm = vR_dm.reshape(-1, ng)[:nao]
            vR_dm = vR_dm * phase.conj()[None, :]
            vk[k1] = vk[k1] + weight * (vR_dm @ ao1T.T)
    return jnp.stack([vk[k1] for k1 in k1_list])
