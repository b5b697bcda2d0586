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
    atoms: dict = None          # l -> (ns,) owning-atom index per shell

    @classmethod
    def from_cell(cls, cell) -> "PackedBasis":
        groups: dict[int, list] = {}
        # AO column offset for each shell in cell ordering
        offsets = cell.ao_loc
        for ish, sh in enumerate(cell.shells):
            groups.setdefault(sh.l, []).append((ish, sh))
        ls = tuple(sorted(groups))
        centers, exps, coeffs, atoms = {}, {}, {}, {}
        cols = []
        for l in ls:
            shells = groups[l]
            P = max(len(sh.exps) for _, sh in shells)
            K = max(sh.nctr for _, sh in shells)
            ns = len(shells)
            ctr = np.zeros((ns, 3))
            es = np.ones((ns, P))
            cs = np.zeros((ns, P, K))
            atoms[l] = np.array([sh.atom for _, sh in shells], dtype=np.int32)
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
                   col_index=col_index, nao=cell.nao, atoms=atoms)


def _eval_block(packed: PackedBasis, images, coords, kpt, dtype,
                img_chunk: int = 32, centers=None):
    """AO values for one grid block: (nb, nao_padded) in packed column order.

    The lattice-image sum runs as a scan over *chunks* of images — each
    step is a dense (ns, nb, nt) batch that keeps the VPU busy instead of
    ~10^3 tiny sequential steps.
    """
    complex_out = kpt is not None
    nimg = images.shape[0]
    npad = (-nimg) % img_chunk
    # pad with far-away dummy images (contribute exp(-large) = 0)
    imgs = jnp.pad(images, ((0, npad), (0, 0)), constant_values=1e6)
    imgs = imgs.reshape(-1, img_chunk, 3)

    blocks = []
    for l in packed.ls:
        if centers is not None:
            ctr = centers[l].astype(dtype)                      # traced (ns,3)
        else:
            ctr = jnp.asarray(packed.centers[l], dtype=dtype)   # (ns,3)
        es = jnp.asarray(packed.exps[l], dtype=dtype)           # (ns,P)
        cs = jnp.asarray(packed.coeffs[l], dtype=dtype)         # (ns,P,K)
        ns, P = es.shape
        K = cs.shape[2]
        M = 2 * l + 1

        def img_step(acc, T):                                   # T: (nt, 3)
            d = (coords[None, :, None, :] - ctr[:, None, None, :]
                 - T[None, None, :, :])                          # (ns,nb,nt,3)
            r2 = jnp.sum(d * d, axis=-1)                         # (ns,nb,nt)
            g = jnp.exp(-es[:, None, None, :] * r2[..., None])   # (ns,nb,nt,P)
            ang = solid_harmonics(l, d, jnp)                     # (ns,nb,nt,M)
            if complex_out:
                ph = jnp.exp(1j * (T @ kpt)).astype(acc.dtype)   # (nt,)
                contrib = jnp.einsum("sntp,spk,sntm,t->snkm",
                                     g.astype(acc.dtype), cs.astype(acc.dtype),
                                     ang.astype(acc.dtype), ph)
            else:
                contrib = jnp.einsum("sntp,spk,sntm->snkm", g, cs, ang)
            return acc + contrib, None

        out_dtype = jnp.result_type(dtype, jnp.complex64) if complex_out else dtype
        nb = coords.shape[0]
        init = jnp.zeros((ns, nb, K, M), dtype=out_dtype)
        acc, _ = jax.lax.scan(img_step, init, imgs)
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


def eval_ao_positions(packed: PackedBasis, coords, images, positions,
                      kpt=None, block_size: int = 8192):
    """aoR as a differentiable function of atom positions.

    Same lattice-image-scanned evaluator as :func:`eval_ao`, but shell
    centers are gathered from the traced ``positions`` array — so
    ``jax.grad`` through any aoR-derived energy yields Pulay/HF force
    contributions with no hand-written derivative code (the TPU-native
    replacement for the reference's analytic gradient kernels,
    pyscf/pbc/df/fft_jk.py:111,304 and lib/pbc/hf_grad.c).
    """
    dtype = coords.dtype
    centers = {l: positions[packed.atoms[l]] for l in packed.ls}
    ng = coords.shape[0]
    nb = min(block_size, ng)
    npad = (-ng) % nb
    coords_p = jnp.pad(coords, ((0, npad), (0, 0)))
    coords_b = coords_p.reshape(-1, nb, 3)
    out = jax.lax.map(
        lambda c: _eval_block(packed, images, c, kpt, dtype, centers=centers),
        coords_b)
    out = out.reshape(-1, out.shape[-1])[:ng]
    col = packed.col_index
    keep = col >= 0
    inv = np.zeros(packed.nao, dtype=np.int32)
    inv[col[keep]] = np.nonzero(keep)[0]
    return out[:, inv]


def shell_rcut(sh, precision: float = 1e-10) -> float:
    """Radius beyond which this shell's most diffuse primitive is negligible."""
    i = int(np.argmin(sh.exps))
    a = float(sh.exps[i])
    c = float(np.abs(sh.coeffs[i]).max()) + 1e-300
    r2 = max(np.log(max(c, 1.0) / precision), 5.0) / a
    for _ in range(3):
        val = c * max(r2, 1.0) ** (sh.l / 2 + 1)
        r2 = max(np.log(max(val, 1e-300) / precision), 5.0) / a
    return float(np.sqrt(r2))


def eval_ao_numpy(cell, coords=None, kpt=None, rcut=None, img_chunk: int = 32,
                  use_native: bool = True):
    """Host-side float64 AO collocation (build-time path).

    Same lattice-image sum as :func:`eval_ao` but on host, used for the
    once-per-geometry hcore/overlap builds where float64 is required even
    when the device runs float32. At Gamma the C/OpenMP kernel
    (native/ao_eval.c) is used when available; the numpy path prunes
    images per shell and processes them in vectorized chunks.
    """
    if coords is None:
        coords = cell.uniform_grid()
    images = cell.lattice_images(rcut)
    if use_native and (kpt is None or np.linalg.norm(kpt) < 1e-12):
        from pyscf_isdf_tpu.ops import native

        out = native.eval_ao_native(cell, coords, images)
        if out is not None:
            return out
    ng = coords.shape[0]
    complex_out = kpt is not None and np.linalg.norm(kpt) > 1e-12
    out = np.zeros((ng, cell.nao), dtype=np.complex128 if complex_out else np.float64)
    ao_loc = cell.ao_loc
    center = coords.mean(axis=0)
    grid_rad = np.sqrt(((coords - center) ** 2).sum(axis=1).max())
    for ish, sh in enumerate(cell.shells):
        A = cell.coords[sh.atom]
        # keep images whose shifted center can reach the grid
        rc = shell_rcut(sh) + grid_rad
        dist = np.linalg.norm(A + images - center, axis=1)
        imgs = images[dist <= rc]
        acc = np.zeros((ng, sh.nctr, 2 * sh.l + 1), dtype=out.dtype)
        for i0 in range(0, len(imgs), img_chunk):
            T = imgs[i0:i0 + img_chunk]                           # (nt, 3)
            d = coords[:, None, :] - A - T[None, :, :]            # (ng, nt, 3)
            r2 = np.einsum("gti,gti->gt", d, d)
            g = np.exp(-sh.exps[None, None, :] * r2[:, :, None])  # (ng, nt, P)
            ang = solid_harmonics(sh.l, d, np)                    # (ng, nt, M)
            if complex_out:
                ph = np.exp(1j * T @ np.asarray(kpt))             # (nt,)
                rad = np.einsum("gtp,pk,t->gtk", g, sh.coeffs, ph)
            else:
                rad = np.einsum("gtp,pk->gtk", g, sh.coeffs)
            acc += np.einsum("gtk,gtm->gkm", rad.astype(out.dtype), ang)
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


def ao_gradient_fft_k(aoR_k, mesh, Gv, kpt, coords):
    """Spectral gradient of Bloch AOs at k: (3, ngrids, nao) complex.

    phi^k = e^{ik.r} u with u periodic; grad phi^k =
    e^{ik.r} ifft(i(G+k) fft(u)).
    """
    ng, nao = aoR_k.shape
    phase = jnp.exp(-1j * coords @ kpt)            # (ng,)
    u = aoR_k * phase[:, None]
    uG = jnp.fft.fftn(u.reshape(*mesh, nao), axes=(0, 1, 2))
    iGk = (1j * (Gv + kpt[None, :]).T).reshape(3, *mesh)
    du = jnp.fft.ifftn(uG[None] * iGk[..., None], axes=(1, 2, 3)).reshape(3, ng, nao)
    return du * phase.conj()[None, :, None]
