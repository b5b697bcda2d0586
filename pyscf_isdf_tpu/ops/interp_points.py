"""Interpolation-point (IP) selection for ISDF (device-side JAX).

Selects n_IP grid points whose AO-pair rows best span the pair-density
space.  Two methods:

  * :func:`pivoted_cholesky_points` — greedy pivoted Cholesky on the
    Hadamard-squared AO Gram matrix Z[g,g'] = (sum_mu ao_mu(g) ao_mu(g'))^2,
    run *matrix-free* (only the diagonal and one row per step are formed).
    This is algebraically equivalent to column-pivoted QR on the pair
    matrix (the QRCP-on-(aoR^T aoR)^{o2} step of the ISDF papers,
    arXiv:1711.01531) but maps cleanly onto TPU: a fori_loop of dense
    (ngrids x nao) matvecs with no column swaps.

  * :func:`cvt_points` — centroidal-Voronoi-tessellation / density-weighted
    K-means (the CVT variant of Dong-Hu-Lin), a fixed-point Lloyd iteration
    over the electron density.

Both return *indices into the grid*, static-shaped (n_ip,).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Selection-Cholesky GEMMs are pinned to f32-exact contractions: the
# TPU's DEFAULT matmul is single-pass bf16 (measured 2.6e-3 rel, round
# 5) and the rank-1/rank-blk downdates accumulate it into near-random
# pivots. One-time build cost — never on the per-iteration path.
_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("n_ip",))
def pivoted_cholesky_points(aoR, n_ip: int):
    """Greedy pivoted Cholesky of Z = (aoR aoR^T)^{o2}, matrix-free.

    Args:
        aoR: (ngrids, nao) AO values (real, Gamma point).
        n_ip: number of interpolation points to select.

    Returns:
        (ip_idx (n_ip,) int32 grid indices, resid_diag (ngrids,) final
        residual diagonal — a convergence diagnostic).
    """
    ng = aoR.shape[0]
    d0 = jnp.sum(aoR * aoR, axis=1) ** 2          # Z diagonal

    def body(i, state):
        d, L, idx = state
        p = jnp.argmax(d).astype(jnp.int32)
        # row p of Z: (aoR @ aoR[p])^2
        zrow = jnp.dot(aoR, aoR[p], precision=_HI) ** 2
        lrow = (zrow - jnp.dot(L.T, L[:, p], precision=_HI)) \
            / jnp.sqrt(jnp.maximum(d[p], 1e-300))
        L = L.at[i].set(lrow)
        d = jnp.maximum(d - lrow * lrow, 0.0)
        d = d.at[p].set(0.0)                       # never re-pick
        idx = idx.at[i].set(p)
        return d, L, idx

    L0 = jnp.zeros((n_ip, ng), dtype=aoR.dtype)
    idx0 = jnp.zeros((n_ip,), dtype=jnp.int32)
    d, L, idx = jax.lax.fori_loop(0, n_ip, body, (d0, L0, idx0))
    return idx, d


@partial(jax.jit, static_argnames=("n_ip", "blk"))
def pivoted_cholesky_points_blocked(aoR, n_ip: int, blk: int = 32):
    """Block-greedy pivoted Cholesky: ``blk`` pivots per outer step.

    Each outer step takes the ``blk`` largest residual-diagonal entries,
    forms their Z-rows against the current residual, runs an in-block
    pivoted Cholesky of the blk x blk submatrix, and applies a rank-blk
    update. Sequential depth drops from n_ip to n_ip/blk, turning the
    latency-bound greedy loop into dense (blk x ngrids) matvec panels —
    the TPU-friendly shape. Selection differs slightly from strict greedy
    but has the same rank-revealing quality (validated by K-build parity).
    """
    ng = aoR.shape[0]
    d0 = jnp.sum(aoR * aoR, axis=1) ** 2
    n_steps = -(-n_ip // blk)
    ncand = min(ng, 4 * blk)   # oversampled candidate panel

    def outer(step, state):
        d, L, idx = state
        # fixed candidate set for this panel: top residual diagonals
        _, cand = jax.lax.top_k(d, ncand)
        cand = cand.astype(jnp.int32)
        zrows = jnp.dot(aoR[cand], aoR.T, precision=_HI) ** 2  # (blk, ng)
        rrows = zrows - jnp.dot(L[:, cand].T, L, precision=_HI)

        def wb(carry, _):
            rr, d_in = carry
            diag_c = d_in[cand]
            jloc = jnp.argmax(diag_c).astype(jnp.int32)
            p = cand[jloc]
            dp = d_in[p]
            lrow = rr[jloc] / jnp.sqrt(jnp.maximum(dp, 1e-300))
            lrow = jnp.where(dp > 1e-30, lrow, jnp.zeros_like(lrow))
            rr = rr - lrow[cand][:, None] * lrow[None, :]
            d_in = jnp.maximum(d_in - lrow * lrow, 0.0)
            d_in = d_in.at[p].set(0.0)
            return (rr, d_in), (lrow, p)

        (_, d_new), (Lblk, picks) = jax.lax.scan(wb, (rrows, d), None,
                                                 length=blk)
        L = jax.lax.dynamic_update_slice(L, Lblk, (step * blk, 0))
        idx = jax.lax.dynamic_update_slice(idx, picks.astype(jnp.int32),
                                           (step * blk,))
        return d_new, L, idx

    L0 = jnp.zeros((n_steps * blk, ng), dtype=aoR.dtype)
    idx0 = jnp.zeros((n_steps * blk,), dtype=jnp.int32)
    d, L, idx = jax.lax.fori_loop(0, n_steps, outer, (d0, L0, idx0))
    return idx[:n_ip], d


def atomic_points(aoR, coords, atom_coords, n_ip_per_atom: int):
    """Atom-partitioned ('robust fit') interpolation points.

    Grid points are Voronoi-assigned to their nearest atom; a greedy
    pivoted Cholesky runs inside each partition with its own IP budget.
    This is the locality-preserving selection of the ISDF fork's robust-fit
    mode: every atom keeps enough points to resolve its own AO products,
    which stabilizes the fit for large supercells.

    Returns (natm * n_ip_per_atom,) global grid indices (host numpy).
    """
    import numpy as np

    coords_n = np.asarray(coords)
    atoms_n = np.asarray(atom_coords)
    d2 = ((coords_n[:, None, :] - atoms_n[None, :, :]) ** 2).sum(-1)
    owner = d2.argmin(axis=1)
    idx_all = []
    for ia in range(len(atoms_n)):
        sel = np.nonzero(owner == ia)[0]
        sub = aoR[sel]
        k = min(n_ip_per_atom, len(sel))
        loc, _ = pivoted_cholesky_points(sub, k)
        idx_all.append(sel[np.asarray(loc)])
    return np.concatenate(idx_all)


@partial(jax.jit, static_argnames=("n_ip", "n_iter"))
def cvt_points(coords, rho, n_ip: int, n_iter: int = 30, seed: int = 0):
    """Density-weighted K-means (CVT) interpolation points.

    Args:
        coords: (ngrids, 3) grid coordinates.
        rho: (ngrids,) nonnegative weights (electron density).
        n_ip: number of centroids.
        n_iter: Lloyd iterations.

    Returns (n_ip,) indices of the grid points closest to the centroids.
    """
    ng = coords.shape[0]
    key = jax.random.PRNGKey(seed)
    # init: sample grid points proportionally to rho
    p = rho / jnp.sum(rho)
    init_idx = jax.random.choice(key, ng, shape=(n_ip,), replace=False, p=p)
    centers = coords[init_idx]

    def lloyd(_, centers):
        d2 = jnp.sum((coords[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)                       # (ng,)
        onehot = jax.nn.one_hot(assign, n_ip, dtype=coords.dtype)
        wsum = onehot.T @ rho                                  # (n_ip,)
        wcoords = onehot.T @ (coords * rho[:, None])           # (n_ip, 3)
        return jnp.where(wsum[:, None] > 0, wcoords / wsum[:, None], centers)

    centers = jax.lax.fori_loop(0, n_iter, lloyd, centers)
    d2 = jnp.sum((coords[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=0).astype(jnp.int32)
