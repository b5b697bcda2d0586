"""Crystalline AO collocation on real-space grids (device-side JAX).

Evaluates the periodic AOs

    Phi_mu^k(r_g) = sum_T e^{i k.T} phi_mu(r_g - R_mu - T)

on the uniform FFT grid. This is the ``aoR`` producer that feeds every grid
method (J/K builds, ISDF interpolation, density evaluation); functional spec
per the reference C kernel pyscf/lib/pbc/grid_ao.c:512-680 driven by
pyscf/pbc/gto/eval_gto.py:31-165.

TPU-first design: shells are grouped per angular momentum and padded to a
static primitive count, the lattice-image sum is a ``lax.scan`` with dense
(nshell_l, ngrid_block) work per step, and the grid axis is blocked via
``lax.map`` so peak memory stays bounded while every FLOP is a dense
VPU/MXU-friendly contraction. Gradients (GGA) are obtained spectrally:
``grad aoR = ifft(iG * fft(aoR))`` — aliasing error is below grid precision
for converged meshes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics


@dataclass(frozen=True, eq=False)  # eq=False: identity hash, usable as jit static arg
class PackedBasis:
    """Shells grouped by l, padded to common primitive/contraction counts.

    All arrays are host numpy; they become device constants when closed over
    by a jitted function. ``col_index[l]`` maps the per-l block's columns into
    the cell's AO ordering (shells in cell order, contraction-major within a
    shell, then m).
    """

    ls: tuple                   # distinct angular momenta present
    centers: dict               # l -> (ns, 3) shell centers
    exps: dict                  # l -> (ns, P) padded exponents
    coeffs: dict                # l -> (ns, P, K) padded coefficients
    col_index: np.ndarray       # (nao,) permutation: aoR[:, col_index] == block order
    nao: int

    @classmethod
    def from_cell(cls, cell) -> "PackedBasis":
        groups: dict[int, list] = {}
        # AO column offset for each shell in cell ordering
        offsets = cell.ao_loc
        for ish, sh in enumerate(cell.shells):
            groups.setdefault(sh.l, []).append((ish, sh))
        ls = tuple(sorted(groups))
        centers, exps, coeffs = {}, {}, {}
        cols = []
        for l in ls:
            shells = groups[l]
            P = max(len(sh.exps) for _, sh in shells)
            K = max(sh.nctr for _, sh in shells)
            ns = len(shells)
            ctr = np.zeros((ns, 3))
            es = np.ones((ns, P))
            cs = np.zeros((ns, P, K))
            for i, (ish, sh) in enumerate(shells):
                ctr[i] = cell.coords[sh.atom]
                es[i, : len(sh.exps)] = sh.exps
                cs[i, : len(sh.exps), : sh.nctr] = sh.coeffs
                # columns this (shell, ctr, m) occupies in cell AO ordering
                base = offsets[ish]
                for k in range(K):
                    for m in range(2 * l + 1):
                        if k < sh.nctr:
                            cols.append(base + k * (2 * l + 1) + m)
                        else:
                            cols.append(-1)  # padding column, dropped later
            centers[l], exps[l], coeffs[l] = ctr, es, cs
        col_index = np.array(cols, dtype=np.int32)
        return cls(ls=ls, centers=centers, exps=exps, coeffs=coeffs,
                   col_index=col_index, nao=cell.nao)


def _eval_block(packed: PackedBasis, images, coords, kpt, dtype):
    """AO values for one grid block: (nb, nao_padded) in packed column order."""
    complex_out = kpt is not None
    blocks = []
    for l in packed.ls:
        ctr = jnp.asarray(packed.centers[l], dtype=dtype)       # (ns,3)
        es = jnp.asarray(packed.exps[l], dtype=dtype)           # (ns,P)
        cs = jnp.asarray(packed.coeffs[l], dtype=dtype)         # (ns,P,K)
        ns, P = es.shape
        K = cs.shape[2]
        M = 2 * l + 1

        def img_step(acc, T):
            d = coords[None, :, :] - ctr[:, None, :] - T[None, None, :]  # (ns,nb,3)
            r2 = jnp.sum(d * d, axis=-1)                                  # (ns,nb)
            g = jnp.exp(-es[:, None, :] * r2[:, :, None])                 # (ns,nb,P)
            rad = jnp.einsum("snp,spk->snk", g, cs)                       # (ns,nb,K)
            ang = solid_harmonics(l, d, jnp)                              # (ns,nb,M)
            contrib = rad[:, :, :, None] * ang[:, :, None, :]             # (ns,nb,K,M)
            if complex_out:
                phase = jnp.exp(1j * jnp.dot(T, kpt)).astype(acc.dtype)
                contrib = contrib * phase
            return acc + contrib, None

        out_dtype = jnp.result_type(dtype, jnp.complex64) if complex_out else dtype
        nb = coords.shape[0]
        init = jnp.zeros((ns, nb, K, M), dtype=out_dtype)
        acc, _ = jax.lax.scan(img_step, init, images)
        blocks.append(acc.transpose(1, 0, 2, 3).reshape(nb, ns * K * M))
    return jnp.concatenate(blocks, axis=1)


@partial(jax.jit, static_argnames=("packed", "block_size"))
def eval_ao(packed: PackedBasis, coords, images, kpt=None, block_size: int = 8192):
    """Evaluate aoR for all grid points.

    Args:
        packed: PackedBasis (static; hashable by id as a frozen dataclass).
        coords: (ngrids, 3) grid coordinates.
        images: (nimg, 3) lattice translation vectors.
        kpt: optional (3,) k-point -> complex output with e^{ikT} phases.
        block_size: grid points per scan block (memory knob).

    Returns:
        (ngrids, nao) AO values in the cell's AO ordering.
    """
    dtype = coords.dtype
    ng = coords.shape[0]
    nb = min(block_size, ng)
    npad = (-ng) % nb
    coords_p = jnp.pad(coords, ((0, npad), (0, 0)))
    coords_b = coords_p.reshape(-1, nb, 3)

    out = jax.lax.map(lambda c: _eval_block(packed, images, c, kpt, dtype), coords_b)
    out = out.reshape(-1, out.shape[-1])[:ng]

    # place packed columns into cell AO ordering (drop padding columns)
    col = packed.col_index
    keep = col >= 0
    inv = np.zeros(packed.nao, dtype=np.int32)
    inv[col[keep]] = np.nonzero(keep)[0]
    return out[:, inv]


def eval_ao_numpy(cell, coords=None, kpt=None, rcut=None):
    """Host-side float64 AO collocation (build-time path).

    Same lattice-image sum as :func:`eval_ao` but in numpy, used for the
    once-per-geometry hcore/overlap builds where float64 is required even
    when the device runs float32.
    """
    if coords is None:
        coords = cell.uniform_grid()
    images = cell.lattice_images(rcut)
    ng = coords.shape[0]
    complex_out = kpt is not None and np.linalg.norm(kpt) > 1e-12
    out = np.zeros((ng, cell.nao), dtype=np.complex128 if complex_out else np.float64)
    ao_loc = cell.ao_loc
    for ish, sh in enumerate(cell.shells):
        A = cell.coords[sh.atom]
        acc = np.zeros((ng, sh.nctr, 2 * sh.l + 1),
                       dtype=out.dtype)
        for T in images:
            d = coords - A - T
            r2 = np.einsum("gi,gi->g", d, d)
            g = np.exp(-sh.exps[None, :] * r2[:, None])          # (ng, P)
            rad = g @ sh.coeffs                                   # (ng, K)
            ang = solid_harmonics(sh.l, d, np)                    # (ng, M)
            contrib = rad[:, :, None] * ang[:, None, :]
            if complex_out:
                contrib = contrib * np.exp(1j * np.dot(T, kpt))
            acc += contrib
        out[:, ao_loc[ish]:ao_loc[ish + 1]] = acc.reshape(ng, sh.nao)
    return out


def ao_gradient_fft(aoR, mesh, Gv):
    """Spectral gradient of gridded periodic functions: (3, ngrids, nao).

    grad f = ifft(i G fft(f)); exact up to aliasing for band-limited aoR.
    """
    ng, nao = aoR.shape
    f = aoR.reshape(*mesh, nao)
    fG = jnp.fft.fftn(f, axes=(0, 1, 2))
    iG = (1j * Gv.T).reshape(3, *mesh)
    out = jnp.fft.ifftn(fG[None] * iG[..., None], axes=(1, 2, 3))
    out = out.reshape(3, ng, nao)
    if not jnp.iscomplexobj(aoR):
        out = out.real
    return out
