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


def test_isdf_k_dd_build():
    """On-device double-float shared-xi build: the REAL k-stacked
    squared Gram goes through the Gamma dd Cholesky machinery directly.
    Measured at diamond 1x1x2 mesh 9^3 n_ip=400 (saturated rank):
    f64 1.4e-9, f32 3.1e-4, dd 4.6e-5 — dd removes ~85% of the f32
    solve error (the remaining floor is the complex64 W-assembly FFT
    of 400 xi rows, larger than the Gamma case's)."""
    import numpy as np
    import jax.numpy as jnp
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.models import diamond_primitive
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.df import fftdf_k, isdf_k

    cell = diamond_primitive(mesh=(9, 9, 9))
    kpts = lattice.make_kpts(cell.a, [1, 1, 2])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    dm = res["dm"]
    nk = len(kpts)
    vk_ref = np.asarray(fftdf_k.get_k_kpts(
        system.aoR_k, jnp.asarray(dm), jnp.asarray(system.coulG_pairs),
        jnp.asarray(system.expmikr), system.mesh, system.weight / nk))

    def kerr(aoR_k, precision):
        f = isdf_k.build_isdf_k(cell, aoR_k, kpts, n_ip=400,
                                precision=precision)
        up = isdf_k.ISDFK(Ug=f.Ug.astype(jnp.complex128),
                          Wq=f.Wq.astype(jnp.complex128),
                          qmap=f.qmap, ip_idx=f.ip_idx)
        vk = np.asarray(isdf_k.get_k_kpts(up, dm))
        return np.abs(vk - vk_ref).max()

    aoR32 = system.aoR_k.astype(jnp.complex64)
    err_f32 = kerr(aoR32, None)
    err_dd = kerr(aoR32, "dd")
    assert err_dd < 1e-4
    assert err_dd < 0.3 * err_f32
