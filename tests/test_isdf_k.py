"""k-point ISDF (per-q W matrices) vs the k-point FFTDF exchange oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.df import fftdf_k, isdf_k


def test_isdf_k_single_kpt_exact():
    """At one k-point the u-pair space rank saturates: ISDF K is exact."""
    cell = diamond_primitive(mesh=(17, 17, 17))
    np.random.seed(3)
    kpts = np.random.random((1, 3)) * 0.3
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    dm = res["dm"]
    vk_ref = fftdf_k.get_k_kpts(
        system.aoR_k, jnp.asarray(dm), jnp.asarray(system.coulG_pairs),
        jnp.asarray(system.expmikr), system.mesh, system.weight,
    )
    isdfk = isdf_k.build_isdf_k(cell, system.aoR_k, kpts, c=8)
    vk = isdf_k.get_k_kpts(isdfk, dm)
    assert np.abs(np.asarray(vk) - np.asarray(vk_ref)).max() < 1e-8


@pytest.mark.slow
def test_isdf_k_222_mesh():
    """2x2x2 k-mesh: per-q W kernels reproduce the double-k-loop FFT K."""
    cell = diamond_primitive(mesh=(17, 17, 17))
    kpts = lattice.make_kpts(cell.a, [2, 2, 2], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    dm = res["dm"]
    nk = len(kpts)
    vk_ref = fftdf_k.get_k_kpts(
        system.aoR_k, jnp.asarray(dm), jnp.asarray(system.coulG_pairs),
        jnp.asarray(system.expmikr), system.mesh, system.weight / nk,
    )
    isdfk = isdf_k.build_isdf_k(cell, system.aoR_k, kpts, c=8)
    vk = isdf_k.get_k_kpts(isdfk, dm)
    assert np.abs(np.asarray(vk) - np.asarray(vk_ref)).max() < 1e-5
