#!/usr/bin/env python
"""THC-MP2 through ISDF factors + multi-chip sharded SCF step.

Run with virtual devices to exercise the sharded path on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/40_thc_mp2_and_multichip.py
"""
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.mp import mp2_energy, thc_mp2_energy
from pyscf_isdf_tpu.df import isdf as isdf_mod

# --- Gamma-point MP2 vs THC-MP2 ---
cell = diamond_primitive(mesh=(16, 16, 16))
system = build_scf_system(cell)
res = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
isdf = isdf_mod.build_isdf(system.aoR, jnp.asarray(system.coulG),
                           system.mesh, system.weight, c=10)
e_mp2 = mp2_energy(system, res)
e_thc = thc_mp2_energy(isdf, res["mo_coeff"], res["mo_energy"],
                       nocc=system.nelec // 2)
print(f"MP2     = {e_mp2:.10f}")
print(f"THC-MP2 = {e_thc:.10f}   (diff {abs(e_thc - e_mp2):.2e})")

# --- multi-chip sharded SCF step (needs >= 2 devices) ---
if len(jax.devices()) >= 2:
    from pyscf_isdf_tpu.parallel.mesh import grid_mesh, GRID_AXIS
    from pyscf_isdf_tpu.parallel.isdf_sharded import build_isdf_sharded
    from pyscf_isdf_tpu.parallel.scf_step import make_scf_step
    from pyscf_isdf_tpu.parallel import distributed_fft as dfft

    ndev = len(jax.devices())
    mesh_dev = grid_mesh(ndev)
    aoR_sh = jax.device_put(system.aoR,
                            NamedSharding(mesh_dev, P(GRID_AXIS, None)))
    coulG = jnp.asarray(system.coulG)
    coulG_t = jax.device_put(
        dfft.coulG_transposed_layout(coulG, tuple(cell.mesh)),
        NamedSharding(mesh_dev, P(GRID_AXIS)),
    )
    isdf_s = build_isdf_sharded(mesh_dev, aoR_sh, coulG, tuple(cell.mesh),
                                cell.grid_weight, n_ip=8 * cell.nao)
    step = make_scf_step(mesh_dev, tuple(cell.mesh), cell.grid_weight,
                         cell.nelectron // 2, xc="lda,vwn")
    dm, e_elec = step(jnp.asarray(res["dm"]), aoR_sh, coulG_t, isdf_s,
                      jnp.asarray(system.hcore), jnp.asarray(system.X),
                      jnp.asarray(system.S))
    print(f"sharded SCF step on {ndev} devices: e_elec = {float(e_elec):.10f}")
