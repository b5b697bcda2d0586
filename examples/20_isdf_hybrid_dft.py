#!/usr/bin/env python
"""Hybrid DFT (PBE0) with ISDF exchange: GEMM-cost K inside the SCF."""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod

cell = diamond_primitive(mesh=(17, 17, 17))
system = build_scf_system(cell)
coulG = jnp.asarray(system.coulG)

# one-time ISDF build: interpolation points + W kernel
isdf = isdf_mod.build_isdf(system.aoR, coulG, system.mesh, system.weight, c=8)
print(f"ISDF built: {isdf.n_ip} interpolation points")


def get_jk(dm, with_k):
    dmj = jnp.asarray(dm, system.aoR.dtype)
    vj = fftdf.get_j(system.aoR, dmj, coulG, system.mesh, system.weight)
    vk = isdf_mod.get_k(isdf, dmj) if with_k else None
    return vj, vk


res = scf_kernel(system, xc="pbe0", exxdiv="ewald", get_jk=get_jk, verbose=True)
print("PBE0/ISDF E =", res["e_tot"])
