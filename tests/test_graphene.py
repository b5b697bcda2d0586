"""BASELINE config 2: hybrid-DFT (PBE0) exchange on graphene at Gamma.

No absolute golden value exists in the reference tests for this config;
the contract is ISDF-K == FFTDF-K inside the converged SCF (<= 1e-7 Ha,
tighter than the 1e-6 Ha bar of BASELINE.md).
"""
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu.models import graphene
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod


def test_graphene_pbe0_isdf_vs_fftdf():
    cell = graphene(mesh=(15, 15, 48))
    assert cell.nao == 8
    system = build_scf_system(cell)
    res_ref = scf_kernel(system, xc="pbe0", exxdiv="ewald", conv_tol=1e-9)
    assert res_ref["converged"]

    coulG = jnp.asarray(system.coulG)
    isdf = isdf_mod.build_isdf(system.aoR, coulG, system.mesh,
                               system.weight, c=8)

    def jk_isdf(dm, with_k):
        dmj = jnp.asarray(dm, dtype=system.aoR.dtype)
        vj = fftdf.get_j(system.aoR, dmj, coulG, system.mesh, system.weight)
        vk = isdf_mod.get_k(isdf, dmj) if with_k else None
        return vj, vk

    res = scf_kernel(system, xc="pbe0", exxdiv="ewald", conv_tol=1e-9,
                     get_jk=jk_isdf)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(res_ref["e_tot"], abs=1e-7)
