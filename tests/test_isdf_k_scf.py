"""k-point ISDF exchange inside a full KRHF SCF (config 3 end-to-end)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.df import fftdf_k, isdf_k


def test_krhf_with_isdf_k_exchange():
    cell = diamond_primitive(mesh=(15, 15, 15))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    nk = len(kpts)

    res_ref = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)

    isdfk = isdf_k.build_isdf_k(cell, system.aoR_k, kpts, c=10)
    coulG = jnp.asarray(system.coulG)

    def jk(dm_k, with_k):
        dmj = jnp.asarray(dm_k, system.aoR_k.dtype)
        vj = fftdf_k.get_j_kpts(system.aoR_k, dmj, coulG, system.mesh,
                                system.weight)
        vk = isdf_k.get_k_kpts(isdfk, dmj) if with_k else None
        return vj, vk

    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10,
                      get_jk=jk)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(res_ref["e_tot"], abs=1e-6)


def test_krks_pbe0_with_isdf_k_exchange():
    """Hybrid KRKS (PBE0, k-point GGA + exact exchange) with k-ISDF K."""
    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)

    res_ref = kscf_kernel(system, xc="pbe0", exxdiv="ewald", conv_tol=1e-9)

    isdfk = isdf_k.build_isdf_k(cell, system.aoR_k, kpts, c=10)
    coulG = jnp.asarray(system.coulG)

    def jk(dm_k, with_k):
        dmj = jnp.asarray(dm_k, system.aoR_k.dtype)
        vj = fftdf_k.get_j_kpts(system.aoR_k, dmj, coulG, system.mesh,
                                system.weight)
        vk = isdf_k.get_k_kpts(isdfk, dmj) if with_k else None
        return vj, vk

    res = kscf_kernel(system, xc="pbe0", exxdiv="ewald", conv_tol=1e-9,
                      get_jk=jk)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(res_ref["e_tot"], abs=1e-6)
