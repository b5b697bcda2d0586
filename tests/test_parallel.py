"""Multi-chip (8 virtual CPU devices) sharding tests.

Single-chip vs ICI-sharded bitwise-tolerance checks — the TPU analog of the
reference's 'multi-node without a real cluster' gap (SURVEY.md section 4):
distributed 3-D FFT, SPMD ISDF build, and the full sharded SCF step must
match their single-device counterparts.
"""
from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod
from pyscf_isdf_tpu.parallel.mesh import grid_mesh, GRID_AXIS
from pyscf_isdf_tpu.parallel.isdf_sharded import build_isdf_sharded
from pyscf_isdf_tpu.parallel.scf_step import make_scf_step
from pyscf_isdf_tpu.parallel import distributed_fft as dfft


@pytest.fixture(scope="module")
def setup():
    cell = diamond_primitive(mesh=(16, 16, 16))  # divisible by 8 devices
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    mesh_dev = grid_mesh(8)
    aoR_sh = jax.device_put(system.aoR, NamedSharding(mesh_dev, P(GRID_AXIS, None)))
    return cell, system, res, mesh_dev, aoR_sh


def test_distributed_poisson(setup):
    cell, system, res, mesh_dev, aoR_sh = setup
    dm = jnp.asarray(res["dm"])
    coulG = jnp.asarray(system.coulG)
    rho = fftdf.get_rho(system.aoR, dm)
    vR_ref = fftdf.ifft3(
        coulG * fftdf.fft3(rho.astype(jnp.complex128), cell.mesh), cell.mesh
    ).real

    coulG_t = dfft.coulG_transposed_layout(coulG, tuple(cell.mesh))
    f = jax.jit(
        partial(
            shard_map, mesh=mesh_dev,
            in_specs=(P(GRID_AXIS), P(GRID_AXIS)), out_specs=P(GRID_AXIS),
            check_vma=False,
        )(lambda r, c: dfft.poisson_slab(r, c, tuple(cell.mesh)))
    )
    vR = f(
        jax.device_put(rho, NamedSharding(mesh_dev, P(GRID_AXIS))),
        jax.device_put(coulG_t, NamedSharding(mesh_dev, P(GRID_AXIS))),
    )
    assert np.abs(np.asarray(vR) - np.asarray(vR_ref)).max() < 1e-12


def test_sharded_isdf_build(setup):
    cell, system, res, mesh_dev, aoR_sh = setup
    dm = jnp.asarray(res["dm"])
    coulG = jnp.asarray(system.coulG)
    isdf_s = build_isdf_sharded(
        mesh_dev, aoR_sh, coulG, tuple(cell.mesh), cell.grid_weight, n_ip=64
    )
    vk_ref = fftdf.get_k(system.aoR, dm, coulG, cell.mesh, cell.grid_weight)
    vk = isdf_mod.get_k(isdf_s, dm)
    assert np.abs(np.asarray(vk - vk_ref)).max() < 1e-9
    # IP grid indices must be valid and the stored aoRg consistent with them
    aoRg_from_idx = np.asarray(system.aoR)[np.asarray(isdf_s.ip_idx)]
    assert np.abs(aoRg_from_idx - np.asarray(isdf_s.aoRg)).max() < 1e-12


def test_sharded_scf_step(setup):
    """One sharded SCF iteration reproduces the host-loop iterate."""
    cell, system, res, mesh_dev, aoR_sh = setup
    coulG = jnp.asarray(system.coulG)
    coulG_t = dfft.coulG_transposed_layout(coulG, tuple(cell.mesh))
    coulG_t_sh = jax.device_put(coulG_t, NamedSharding(mesh_dev, P(GRID_AXIS)))
    isdf_s = build_isdf_sharded(
        mesh_dev, aoR_sh, coulG, tuple(cell.mesh), cell.grid_weight, n_ip=64
    )
    nocc = cell.nelectron // 2
    step = make_scf_step(mesh_dev, tuple(cell.mesh), cell.grid_weight, nocc,
                         xc="lda,vwn")
    dm = jnp.asarray(res["dm"])
    dm_new, e_elec = step(dm, aoR_sh, coulG_t_sh, isdf_s,
                          jnp.asarray(system.hcore), jnp.asarray(system.X),
                          jnp.asarray(system.S))
    # converged dm must be a fixed point; electronic energy must match
    assert np.abs(np.asarray(dm_new) - res["dm"]).max() < 1e-6
    e_ref = res["e_tot"] - system.e_nuc
    assert float(e_elec) == pytest.approx(e_ref, abs=1e-9)


@pytest.mark.slow
def test_sharded_blocked_build_large():
    """SPMD panel-pivoted build at n_ip=4096 (VERDICT r1 next-step 7):
    the distributed xi/W math must match a single-device rebuild from the
    SAME interpolation points to 1e-9, and the resulting exchange matrix
    must agree with a single-device blocked factorization at fit accuracy."""
    from pyscf_isdf_tpu.models import diamond_supercell
    from pyscf_isdf_tpu.ops.ao_eval import PackedBasis, eval_ao
    from pyscf_isdf_tpu.ops import coulomb

    # dzvp so the pair rank (~21.7k) exceeds n_ip — with szv the rank is
    # 2080 and picks beyond it are degenerate by construction. Only aoR
    # and the kernel are needed (skip the full hcore/PP system build);
    # the XLA evaluator is used (host numpy eval of a dzvp supercell
    # takes tens of minutes).
    cell = diamond_supercell(nrep=(2, 2, 2), mesh=(32, 32, 32),
                             basis="gth-dzvp")
    packed = PackedBasis.from_cell(cell)
    aoR = eval_ao(packed, jnp.asarray(cell.uniform_grid()),
                  jnp.asarray(cell.lattice_images()))
    mesh_dev = grid_mesh(8)
    aoR_sh = jax.device_put(aoR, NamedSharding(mesh_dev, P(GRID_AXIS, None)))
    coulG = jnp.asarray(coulomb.get_coulG(cell))
    mesh3 = tuple(cell.mesh)
    w = cell.grid_weight
    n_ip = 4096

    sh = build_isdf_sharded(mesh_dev, aoR_sh, coulG, mesh3, w, n_ip=n_ip,
                            method="blocked", blk=64)
    assert sh.n_ip == n_ip
    # IP indices must be unique (no device double-picks a point)
    assert len(np.unique(np.asarray(sh.ip_idx))) == n_ip

    # strict check: rebuild xi/W single-device FROM THE SAME points
    from pyscf_isdf_tpu.df.isdf import _build_from_idx

    aoRg_1, W_1, _ = _build_from_idx(aoR, jnp.asarray(sh.ip_idx),
                                     coulG, mesh3, w)
    assert np.abs(np.asarray(sh.aoRg) - np.asarray(aoRg_1)).max() < 1e-9
    assert np.abs(np.asarray(sh.W) - np.asarray(W_1)).max() < 1e-9

    # quality check: exchange parity against a single-device blocked build
    ref = isdf_mod.build_isdf(aoR, coulG, mesh3, w, n_ip=n_ip,
                              method="cholesky-blocked")
    dm = jnp.asarray(2.0 / cell.nao * np.eye(cell.nao))
    vk_sh = isdf_mod.get_k(sh, dm)
    vk_ref = isdf_mod.get_k(ref, dm)
    de = abs(float(jnp.einsum("ij,ji->", dm, vk_sh - vk_ref)))
    assert de < 1e-6
