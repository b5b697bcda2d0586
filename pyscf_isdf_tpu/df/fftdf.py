"""FFT-based density fitting: plane-wave Poisson J and K builds (device JAX).

The numerics oracle of the framework and the J engine of the SCF hot loop
(algorithmic contract per the reference pyscf/pbc/df/fft_jk.py:33-109 for J
and :177-302 for K). ISDF replaces the K build; J stays O(N log N) here.

All functions are pure and jit-compiled; the FFT grid axis is kept flat
(ngrids,) at the API and reshaped to the 3-D mesh only around the transforms.

Conventions (reference pyscf/pbc/tools/pbc.py:149-228):
  fft is unnormalized, ifft carries 1/N;  V(r) = ifft(coulG * fft(rho))
  exactly (the 1/vol of the Fourier series cancels the vol/N of the
  forward-transform quadrature), and matrix elements take one grid weight
  vol/ngrids.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def fft3(f, mesh):
    """FFT over the flattened grid axis (last-but-one ... see usage)."""
    shape = f.shape
    f3 = f.reshape(shape[:-1] + tuple(mesh))
    return jnp.fft.fftn(f3, axes=(-3, -2, -1)).reshape(shape)


def ifft3(f, mesh):
    shape = f.shape
    f3 = f.reshape(shape[:-1] + tuple(mesh))
    return jnp.fft.ifftn(f3, axes=(-3, -2, -1)).reshape(shape)


@jax.jit
def get_rho(aoR, dm):
    """Electron density on the grid: rho_g = sum_{ij} D_ij ao_i(g) ao_j(g)."""
    t = aoR @ dm
    rho = jnp.sum(t * aoR.conj(), axis=-1)
    return rho.real


@partial(jax.jit, static_argnames=("mesh",))
def get_j(aoR, dm, coulG, mesh, weight):
    """Coulomb matrix via one FFT Poisson solve (Gamma point).

    vj_ij = w * sum_g ao_i(g) V(g) ao_j(g),  V = ifft(coulG * fft(rho)).
    """
    t = aoR @ dm
    rho = jnp.sum(t * aoR.conj(), axis=-1).real
    vG = coulG * fft3(rho.astype(jnp.complex128 if rho.dtype == jnp.float64
                                 else jnp.complex64), mesh)
    vR = ifft3(vG, mesh).real.astype(aoR.dtype)
    return weight * ((aoR.conj().T * vR) @ aoR)


def _k_chunk(ao1_blk, aoR, aoD, coulG, mesh, weight):
    """Exchange rows for one block of AOs (Gamma, real arithmetic).

    rho1[i,l,g] = ao_i(g) ao_l(g);  vR = ifft(coulG fft(rho1));
    vk_blk[i,j] = w sum_g (sum_l vR[i,l,g] aoD[l,g]) ao_j(g).
    """
    cdtype = jnp.complex128 if aoR.dtype == jnp.float64 else jnp.complex64
    rho1 = ao1_blk[:, None, :] * aoR.T[None, :, :]            # (b, nao, ng)
    vG = coulG[None, None, :] * fft3(rho1.astype(cdtype), mesh)
    vR = ifft3(vG, mesh).real.astype(aoR.dtype)
    vR_dm = jnp.einsum("ilg,lg->ig", vR, aoD)
    return weight * (vR_dm @ aoR)


@partial(jax.jit, static_argnames=("mesh", "chunk"))
def get_k(aoR, dm, coulG, mesh, weight, chunk: int = 16):
    """Exchange matrix via pair-density FFTs (Gamma point, real AOs).

    This is the O(nao * ngrids log ngrids) per-iteration cost that the ISDF
    engine amortizes away; kept as the numerics oracle and fallback.
    """
    ng, nao = aoR.shape
    aoD = (dm @ aoR.T)                                        # (nao, ng)
    aoT = aoR.T                                               # (nao, ng)
    npad = (-nao) % chunk
    aoT_p = jnp.pad(aoT, ((0, npad), (0, 0)))
    blocks = aoT_p.reshape(-1, chunk, ng)
    vk_blocks = jax.lax.map(
        lambda blk: _k_chunk(blk, aoR, aoD, coulG, mesh, weight), blocks
    )
    return vk_blocks.reshape(-1, nao)[:nao]


def get_k_occ(aoR, mo_w, coulG, mesh, weight, chunk: int = 16):
    """Exchange via occupied-MO pair-density FFTs (Gamma point).

    The reference's tagged-DM fast path (pyscf/pbc/df/fft_jk.py:235-259:
    when the density matrix carries mo_coeff/mo_occ, exchange pairs are
    built against the nocc occupied orbitals instead of all nao AOs) —
    nao*nocc grid FFTs per build instead of nao^2, an nao/nocc speedup.

    Args:
        mo_w: (ng, nocc) occupied MOs on the grid, each scaled by
            sqrt(occ) — K[dm] with dm = (C*occ) C^T exactly.
    """
    ng, nao = aoR.shape
    no = mo_w.shape[1]
    aoT = aoR.T                                               # (nao, ng)
    cdtype = jnp.complex128 if aoR.dtype == jnp.float64 else jnp.complex64

    def k_chunk(blk):                                         # (b, ng) AOs
        rho1 = blk[:, None, :] * mo_w.T[None, :, :]           # (b, no, ng)
        vG = coulG[None, None, :] * fft3(rho1.astype(cdtype), mesh)
        vR = ifft3(vG, mesh).real.astype(aoR.dtype)
        return jnp.einsum("big,ig->bg", vR, mo_w.T)           # (b, ng)

    npad = (-nao) % chunk
    blocks = jnp.pad(aoT, ((0, npad), (0, 0))).reshape(-1, chunk, ng)
    acc = jax.lax.map(k_chunk, blocks).reshape(-1, ng)[:nao]  # (nao, ng)
    return weight * (acc @ aoR)


def apply_ewald_exxdiv(vk, dm, ovlp, madelung):
    """Probe-charge G=0 exchange correction: vk += madelung * S D S.

    Applied post-hoc exactly as the reference does
    (pyscf/pbc/df/df_jk.py:1446) to bypass FFT discretization error at G=0.
    """
    return vk + madelung * (ovlp @ dm @ ovlp)
