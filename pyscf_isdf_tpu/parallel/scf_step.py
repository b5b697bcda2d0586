"""Fully jitted, grid-sharded SCF iteration (the multi-chip hot loop).

One step: dm -> (J via distributed Poisson, K via replicated ISDF GEMMs,
LDA Vxc with psum'd quadrature) -> Fock -> eigensolve -> new dm. Grid-sized
tensors live sharded as x-slabs over the ICI mesh; nao-sized matrices are
replicated. This is the step the driver dry-runs on an N-device mesh and
the benchmark times on hardware.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pyscf_isdf_tpu.df import isdf as isdf_mod
from pyscf_isdf_tpu.parallel.mesh import GRID_AXIS
from pyscf_isdf_tpu.parallel import distributed_fft as dfft
from pyscf_isdf_tpu.ops.xc import XCSpec


def make_scf_step(dev_mesh, mesh3, weight, nocc, xc: str | None = None,
                  exxdiv_madelung: float = 0.0):
    """Build a jitted sharded SCF-iteration function.

    Returns ``step(dm, aoR, coulG_t, isdf, hcore, X, S) -> (dm_new, e_elec)``
    where aoR is sharded P(GRID_AXIS, None) and coulG_t is the transposed-
    layout kernel sharded P(GRID_AXIS).
    """
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb

    @partial(
        shard_map,
        mesh=dev_mesh,
        in_specs=(P(GRID_AXIS, None), P(GRID_AXIS), P(None, None)),
        out_specs=(P(None, None), P(None, None), P(None)),
        check_vma=False,
    )
    def _grid_part(aoR_l, coulG_t_l, dm):
        t = aoR_l @ dm
        rho_l = jnp.sum(t * aoR_l, axis=-1)
        vR_l = dfft.poisson_slab(rho_l, coulG_t_l, mesh3)
        vj = jax.lax.psum(weight * ((aoR_l.T * vR_l) @ aoR_l), GRID_AXIS)
        if xcspec is not None:
            exc, vrho, _ = xcspec.exc_vxc(rho_l)
            e_xc = jax.lax.psum(weight * jnp.sum(rho_l * exc), GRID_AXIS)
            vxc = jax.lax.psum(weight * ((aoR_l.T * vrho) @ aoR_l), GRID_AXIS)
        else:
            e_xc = jnp.zeros((), aoR_l.dtype)
            vxc = jnp.zeros_like(vj)
        return vj, vxc, e_xc[None]

    @jax.jit
    def step(dm, aoR, coulG_t, isdf, hcore, X, S):
        vj, vxc, e_xc = _grid_part(aoR, coulG_t, dm)
        e_xc = e_xc[0]
        veff = vj + vxc
        e_k = jnp.zeros((), dm.dtype)
        if hyb > 0:
            vk = isdf_mod.get_k(isdf, dm)
            vk = vk + exxdiv_madelung * (S @ dm @ S)
            veff = veff - 0.5 * hyb * vk
            e_k = -0.25 * hyb * jnp.einsum("ij,ji->", dm, vk)
        F = hcore + veff
        Fp = X.T @ F @ X
        e, u = jnp.linalg.eigh(Fp)
        C = X @ u
        Cocc = C[:, :nocc]
        dm_new = 2.0 * Cocc @ Cocc.T
        e_elec = (
            jnp.einsum("ij,ji->", dm, hcore)
            + 0.5 * jnp.einsum("ij,ji->", dm, vj)
            + e_xc + e_k
        )
        return dm_new, e_elec

    return step
