"""Multi-chip ISDF build and SCF step: grid axis sharded over the ICI mesh.

Replaces the reference's blocking/MPI machinery (SURVEY.md section 2.5):
aoR is row-sharded into x-slabs, the interpolation-point search runs as an
SPMD greedy pivoted Cholesky (per-step all_gather of one candidate row per
device), the interpolation-vector FFTs go through the distributed 3-D FFT
(all_to_all transposes), and the W assembly is a psum. The per-iteration
J/K/Vxc builds need only replicated n_IP-sized GEMMs plus one distributed
Poisson solve for exact J.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pyscf_isdf_tpu.df.isdf import ISDF
from pyscf_isdf_tpu.parallel.mesh import GRID_AXIS
from pyscf_isdf_tpu.parallel import distributed_fft as dfft


def _select_ips_local(aoR_l, n_ip: int):
    """SPMD greedy pivoted Cholesky on the sharded Hadamard-squared Gram.

    Runs inside shard_map. Returns (aoRg replicated (n_ip, nao),
    owner (n_ip,) device index, local_idx (n_ip,) local grid index).
    """
    ngl, nao = aoR_l.shape
    me = jax.lax.axis_index(GRID_AXIS)
    d0 = jnp.sum(aoR_l * aoR_l, axis=1) ** 2

    def body(i, state):
        d, L, aoRg, owners, locs = state
        pl = jnp.argmax(d).astype(jnp.int32)
        cand = jnp.concatenate([d[pl][None], aoR_l[pl], L[:, pl]])
        allc = jax.lax.all_gather(cand, GRID_AXIS)            # (Pdev, 1+nao+nip)
        j = jnp.argmax(allc[:, 0]).astype(jnp.int32)
        dmax = allc[j, 0]
        row_ao = allc[j, 1:1 + nao]
        Lp = allc[j, 1 + nao:]
        zrow = (aoR_l @ row_ao) ** 2
        lrow = (zrow - L.T @ Lp) / jnp.sqrt(jnp.maximum(dmax, 1e-300))
        L = L.at[i].set(lrow)
        d = jnp.maximum(d - lrow * lrow, 0.0)
        d = jnp.where(me == j, d.at[pl].set(0.0), d)
        aoRg = aoRg.at[i].set(row_ao)
        owners = owners.at[i].set(j)
        locs = locs.at[i].set(jnp.where(me == j, pl, -1))
        return d, L, aoRg, owners, locs

    state = (
        d0,
        jnp.zeros((n_ip, ngl), aoR_l.dtype),
        jnp.zeros((n_ip, nao), aoR_l.dtype),
        jnp.zeros((n_ip,), jnp.int32),
        jnp.zeros((n_ip,), jnp.int32),
    )
    _, _, aoRg, owners, locs = jax.lax.fori_loop(0, n_ip, body, state)
    return aoRg, owners, locs


def _select_ips_local_blocked(aoR_l, n_ip: int, n_dev: int, blk: int = 64):
    """SPMD block-greedy pivoted Cholesky: ``blk`` pivots per all_gather.

    Each panel step gathers every device's top-``blk`` residual-diagonal
    candidates (ao row + current L column each), then all devices run the
    same in-panel scan: global argmax over the replicated candidate diag,
    local lrow update from the distributed residual rows. One collective
    per ``blk`` picks instead of one per pick — the latency win that makes
    n_ip >= 4096 builds practical (VERDICT r1 weak #8 / next-step 7).
    """
    ngl, nao = aoR_l.shape
    me = jax.lax.axis_index(GRID_AXIS)
    d0 = jnp.sum(aoR_l * aoR_l, axis=1) ** 2
    n_steps = -(-n_ip // blk)
    n_tot = n_steps * blk
    ncl = blk                                  # per-device candidates
    C = n_dev * ncl

    def outer(step, state):
        d, L, aoRg, owners, locs = state
        vals, idxl = jax.lax.top_k(d, ncl)
        cand_ao = aoR_l[idxl]                              # (ncl, nao)
        cand_L = L[:, idxl].T                              # (ncl, n_tot)
        pack = jnp.concatenate(
            [vals[:, None], idxl[:, None].astype(d.dtype), cand_ao, cand_L],
            axis=1)
        allp = jax.lax.all_gather(pack, GRID_AXIS).reshape(C, -1)
        d_c = allp[:, 0]
        gidx = allp[:, 1].astype(jnp.int32)                # local idx @ owner
        ao_c = allp[:, 2:2 + nao]
        L_c = allp[:, 2 + nao:].T                          # (n_tot, C)
        own_c = jnp.repeat(jnp.arange(n_dev, dtype=jnp.int32), ncl)

        rrows = (ao_c @ aoR_l.T) ** 2 - L_c.T @ L          # (C, ngl) local
        rcc = (ao_c @ ao_c.T) ** 2 - L_c.T @ L_c           # (C, C) replicated

        def wb(carry, _):
            rr, rc_m, d_l, dc = carry
            j = jnp.argmax(dc).astype(jnp.int32)
            dj = dc[j]
            inv = jnp.where(dj > 1e-30,
                            1.0 / jnp.sqrt(jnp.maximum(dj, 1e-300)), 0.0)
            lrow = rr[j] * inv                             # (ngl,) local
            rc = rc_m[j] * inv                             # (C,) replicated
            rr = rr - rc[:, None] * lrow[None, :]
            rc_m = rc_m - rc[:, None] * rc[None, :]
            d_l = jnp.maximum(d_l - lrow * lrow, 0.0)
            dc = jnp.maximum(dc - rc * rc, 0.0)
            dc = dc.at[j].set(0.0)
            loc_j = gidx[j]
            d_l = jnp.where(me == own_c[j], d_l.at[loc_j].set(0.0), d_l)
            return (rr, rc_m, d_l, dc), (
                lrow, ao_c[j], own_c[j],
                jnp.where(me == own_c[j], loc_j, -1))

        (_, _, d_new, _), (Lblk, ao_rows, owns, locl) = jax.lax.scan(
            wb, (rrows, rcc, d, d_c), None, length=blk)
        L = jax.lax.dynamic_update_slice(L, Lblk, (step * blk, 0))
        aoRg = jax.lax.dynamic_update_slice(aoRg, ao_rows, (step * blk, 0))
        owners = jax.lax.dynamic_update_slice(owners, owns, (step * blk,))
        locs = jax.lax.dynamic_update_slice(locs, locl, (step * blk,))
        return d_new, L, aoRg, owners, locs

    state = (
        d0,
        jnp.zeros((n_tot, ngl), aoR_l.dtype),
        jnp.zeros((n_tot, nao), aoR_l.dtype),
        jnp.zeros((n_tot,), jnp.int32),
        jnp.zeros((n_tot,), jnp.int32),
    )
    _, _, aoRg, owners, locs = jax.lax.fori_loop(0, n_steps, outer, state)
    return aoRg[:n_ip], owners[:n_ip], locs[:n_ip]


def _xi_and_w_local(aoR_l, aoRg, coulG_t_l, mesh3, weight, fft_chunk: int):
    """Interpolation vectors (local columns) and the psum'd W matrix."""
    nip = aoRg.shape[0]
    C1 = (aoRg @ aoRg.T) ** 2
    C2_l = (aoR_l @ aoRg.T) ** 2                            # (ngl, nip)
    # dtype-aware regularization: 1e-12 is below f32 resolution and
    # leaves the near-singular Gram factorization unstable on TPU
    is_f64 = jnp.finfo(aoR_l.dtype).bits >= 64
    # f32 needs the shift relative to the LARGEST eigenvalue
    # (~trace), not the mean diagonal, to keep Cholesky finite
    eps = jnp.asarray(1e-12 if is_f64 else 3e-7, aoR_l.dtype) \
        * (jnp.trace(C1) / nip if is_f64 else jnp.trace(C1))
    cho = jax.scipy.linalg.cho_factor(C1 + eps * jnp.eye(nip, dtype=aoR_l.dtype))
    xi_l = jax.scipy.linalg.cho_solve(cho, C2_l.T)          # (nip, ngl)

    def v_of(block):
        return dfft.poisson_slab(block, coulG_t_l, mesh3)

    npad = (-nip) % fft_chunk
    xi_p = jnp.pad(xi_l, ((0, npad), (0, 0)))
    Vxi = jax.lax.map(v_of, xi_p.reshape(-1, fft_chunk, xi_l.shape[1]))
    Vxi = Vxi.reshape(-1, xi_l.shape[1])[:nip]
    W = weight * (xi_l @ Vxi.T)
    W = jax.lax.psum(W, GRID_AXIS)
    return xi_l, 0.5 * (W + W.T)


def build_isdf_sharded(dev_mesh, aoR, coulG, mesh3, weight, n_ip: int,
                       fft_chunk: int = 64, method: str = "auto",
                       blk: int = 64) -> ISDF:
    """Multi-chip ISDF build; returns a replicated :class:`ISDF`.

    Args:
        dev_mesh: jax.sharding.Mesh with axis GRID_AXIS.
        aoR: (ngrids, nao) — sharded (or shardable) along the grid axis.
        coulG: (ngrids,) plain Coulomb kernel in standard FFT layout.
        method: 'greedy' (one all_gather per pivot), 'blocked' (panel
            pivoting, one all_gather per blk pivots), or 'auto' (blocked
            once n_ip >= 512).
    """
    coulG_t = dfft.coulG_transposed_layout(jnp.asarray(coulG, aoR.dtype), mesh3)
    n_dev = int(np.prod([dev_mesh.shape[ax] for ax in dev_mesh.axis_names]))
    if method == "auto":
        method = "blocked" if n_ip >= 512 else "greedy"

    @partial(
        shard_map,
        mesh=dev_mesh,
        in_specs=(P(GRID_AXIS, None), P(GRID_AXIS)),
        out_specs=(P(None, None), P(None, None), P(None), P(None)),
        check_vma=False,
    )
    def _build(aoR_l, coulG_t_l):
        if method == "blocked":
            aoRg, owners, locs = _select_ips_local_blocked(aoR_l, n_ip,
                                                           n_dev, blk=blk)
        else:
            aoRg, owners, locs = _select_ips_local(aoR_l, n_ip)
        _, W = _xi_and_w_local(aoR_l, aoRg, coulG_t_l, mesh3, weight, fft_chunk)
        # global grid index of each IP: owner's slab offset + local index
        ngl = aoR_l.shape[0]
        glob = jax.lax.psum(jnp.where(locs >= 0, owners * ngl + locs, 0),
                            GRID_AXIS)
        return aoRg, W, glob.astype(jnp.int32), owners

    fn = jax.jit(_build)
    aoRg, W, ip_idx, _ = fn(aoR, coulG_t)
    return ISDF(aoRg=aoRg, W=W, ip_idx=ip_idx)
