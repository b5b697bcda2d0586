"""Validate robust_k_error (the exact residual identity) against the
direct f64 trace difference at the diamond 2x2x2 converged LDA density
(round-2 f64 |dEk| table anchors: c=16 greedy robust -> 4.9e-5 Ha,
c=24 -> 5.5e-7 Ha), and measure the f32-BUILT factorization's error.

Measured results (2026-08-17, this box):
    c=16: direct f64 dE = 3.177e-05, residual f64 = 3.177e-05 (exact
    identity match), residual f32 (f32-built factorization) = 9.4e-04.

The 30x f32 degradation is REAL method error of the f32 build (the
f32-scale Gram regularization + f32 Cholesky), faithfully reported by
the residual estimator — NOT estimator noise. This is why the bench's
certified configuration is built in float64 per momentum transfer
(tools/certify_sym.py + df/isdf_sym.py) and only CAST to f32 for the
TPU timing run.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python tools/validate_residual.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def main():
    from pyscf_isdf_tpu.models import diamond_supercell
    from pyscf_isdf_tpu.ops import coulomb
    from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
    from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod

    t0 = time.time()
    cell = diamond_supercell(nrep=(2, 2, 2), mesh=(32, 32, 32))
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    assert res["converged"]
    print(f"SCF: {time.time()-t0:.0f} s  E = {res['e_tot']:.9f}",
          flush=True)

    nocc = system.nelec // 2
    C_w = np.asarray(res["mo_coeff"])[:, :nocc] * np.sqrt(2.0)
    dm = jnp.asarray(C_w @ C_w.T)

    aoR = system.aoR
    coulG = jnp.asarray(system.coulG)
    mesh3, w = tuple(cell.mesh), cell.grid_weight

    for c, anchor in ((16, 4.9e-5), (24, 5.5e-7)):
        isdf = isdf_mod.build_isdf(aoR, coulG, mesh3, w, c=float(c),
                                   keep_v=True)
        # direct f64 difference (the table's own definition)
        vk_ref = fftdf.get_k(aoR, dm, coulG, mesh3, w)
        vk_rob = isdf_mod.get_k_robust(isdf, aoR, dm, w)
        de_direct = float(jnp.einsum("ij,ji->", dm, vk_ref - vk_rob))
        # residual identity, f64
        t0 = time.time()
        de_res64 = isdf_mod.robust_k_error(
            isdf, aoR, jnp.asarray(C_w), coulG, mesh3, w)
        t64 = time.time() - t0
        # residual identity, f32 (the TPU-dtype claim)
        aoR32 = aoR.astype(jnp.float32)
        isdf32 = isdf_mod.build_isdf(aoR32, coulG.astype(jnp.float32),
                                     mesh3, np.float32(w), c=float(c),
                                     keep_v=True)
        t0 = time.time()
        de_res32 = isdf_mod.robust_k_error(
            isdf32, aoR32, jnp.asarray(C_w, jnp.float32),
            coulG.astype(jnp.float32), mesh3, np.float32(w))
        t32 = time.time() - t0
        # direct f64 trace difference OF THE F32-BUILT factorization:
        # cast its factors up and evaluate exactly — if the f32
        # residual estimator is cancellation-free, it must report THIS
        # number (the f32 build's true method error), not noise
        from pyscf_isdf_tpu.df.isdf import ISDF as _ISDF
        isdf32_up = _ISDF(aoRg=isdf32.aoRg.astype(jnp.float64),
                          W=isdf32.W.astype(jnp.float64),
                          ip_idx=isdf32.ip_idx,
                          Vxi=isdf32.Vxi.astype(jnp.float64))
        vk_rob32 = isdf_mod.get_k_robust(isdf32_up, aoR, dm, w)
        de32_direct = float(jnp.einsum("ij,ji->", dm, vk_ref - vk_rob32))
        print(f"c={c}: direct f64 dE = {de_direct:.3e}  "
              f"residual f64 = {de_res64:.3e} [{t64:.0f}s]  "
              f"f32-built: direct = {de32_direct:.3e}, "
              f"residual f32 = {de_res32:.3e} [{t32:.0f}s]  "
              f"(table anchor {anchor:.1e})", flush=True)
        assert abs(de_res64 - de_direct) < 0.02 * abs(de_direct) + 1e-9, \
            "identity does not match the direct f64 difference"
        # the f32 estimator must report the f32 build's true error
        # (generous band: the in-kernel xi re-solve is itself f32)
        assert 0.2 * abs(de32_direct) < abs(de_res32) \
            < 5.0 * abs(de32_direct), \
            "f32 residual estimate does not track the f32 build's error"

    print("OK", flush=True)


if __name__ == "__main__":
    main()
