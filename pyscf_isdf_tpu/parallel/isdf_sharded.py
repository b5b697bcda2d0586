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


def _xi_and_w_local(aoR_l, aoRg, coulG_t_l, mesh3, weight, fft_chunk: int):
    """Interpolation vectors (local columns) and the psum'd W matrix."""
    nip = aoRg.shape[0]
    C1 = (aoRg @ aoRg.T) ** 2
    C2_l = (aoR_l @ aoRg.T) ** 2                            # (ngl, nip)
    eps = jnp.asarray(1e-12, aoR_l.dtype) * jnp.trace(C1) / nip
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
                       fft_chunk: int = 64) -> ISDF:
    """Multi-chip ISDF build; returns a replicated :class:`ISDF`.

    Args:
        dev_mesh: jax.sharding.Mesh with axis GRID_AXIS.
        aoR: (ngrids, nao) — sharded (or shardable) along the grid axis.
        coulG: (ngrids,) plain Coulomb kernel in standard FFT layout.
    """
    coulG_t = dfft.coulG_transposed_layout(jnp.asarray(coulG, aoR.dtype), mesh3)

    @partial(
        shard_map,
        mesh=dev_mesh,
        in_specs=(P(GRID_AXIS, None), P(GRID_AXIS)),
        out_specs=(P(None, None), P(None, None), P(None), P(None)),
        check_vma=False,
    )
    def _build(aoR_l, coulG_t_l):
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
