"""f32 ISDF W-build conditioning guard (VERDICT r1 weak #10).

The TPU path runs float32; the near-singular Gram solve needs the
dtype-aware regularization (df/isdf.py eps) to stay stable. This test
exercises the f32 build on CPU so conditioning regressions surface in CI
before the TPU benchmark does.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system
from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod


def test_f32_build_tracks_f64():
    cell = diamond_primitive(mesh=(15, 15, 15))
    system = build_scf_system(cell)          # f64 (x64 enabled in tests)
    aoR64 = system.aoR
    coulG64 = jnp.asarray(system.coulG)
    mesh3, w = tuple(cell.mesh), cell.grid_weight
    dm64 = jnp.asarray(2.0 / cell.nao * np.eye(cell.nao))

    isdf64 = isdf_mod.build_isdf(aoR64, coulG64, mesh3, w, c=10)
    vk64 = isdf_mod.get_k(isdf64, dm64)
    e64 = float(jnp.einsum("ij,ji->", dm64, vk64))

    aoR32 = aoR64.astype(jnp.float32)
    coulG32 = coulG64.astype(jnp.float32)
    isdf32 = isdf_mod.build_isdf(aoR32, coulG32, mesh3, np.float32(w), c=10)
    assert np.all(np.isfinite(np.asarray(isdf32.W)))
    vk32 = isdf_mod.get_k(isdf32, dm64.astype(jnp.float32))
    e32 = float(jnp.einsum("ij,ji->", dm64.astype(jnp.float32), vk32))
    # f32 rounding floor is ~1e-6 relative on an O(10 Ha) trace; the
    # guard catches conditioning blowups (which produce 1e-2+ or NaN)
    assert abs(e32 - e64) < 5e-4
    # robust-fit variant must also stay finite and close in f32
    isdf32r = isdf_mod.build_isdf(aoR32, coulG32, mesh3, np.float32(w),
                                  c=10, keep_v=True)
    vk32r = isdf_mod.get_k_robust(isdf32r, aoR32, dm64.astype(jnp.float32),
                                  np.float32(w))
    e32r = float(jnp.einsum("ij,ji->", dm64.astype(jnp.float32), vk32r))
    assert abs(e32r - e64) < 5e-4
