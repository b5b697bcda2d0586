"""Stage 1 of the BENCH_r03 accuracy certification (VERDICT r2 next #1).

Converges the diamond 3x3x3 / 48^3 LDA density in float64 on CPU (the
exact configuration bench.py times) and stores the sqrt(occupation)-
scaled occupied orbitals C_w to tools/density_333.npz. bench.py loads
this factor and evaluates the EXACT residual identity

    tr(D (K_exact - K_robust)) = w sum_ij (r_ij, V r_ij)

on the TPU at the bench's robust-ISDF configuration
(pyscf_isdf_tpu.df.isdf.robust_k_error) — a positive sum with no
large-number cancellation, so its f32 evaluation carries the f64-grade
method error (validated against the f64 dEk table at diamond 2x2x2,
BENCH_NOTES).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python tools/density_333.py
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
    from pyscf_isdf_tpu.ops.ao_eval import PackedBasis, eval_ao
    from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel

    t0 = time.time()
    cell = diamond_supercell(nrep=(3, 3, 3), mesh=(48, 48, 48))
    packed = PackedBasis.from_cell(cell)
    aoR = eval_ao(packed, jnp.asarray(cell.uniform_grid()),
                  jnp.asarray(cell.lattice_images()))
    aoR.block_until_ready()
    print(f"aoR (XLA f64): {time.time()-t0:.0f} s", flush=True)

    t0 = time.time()
    system = build_scf_system(cell, aoR=np.asarray(aoR))
    print(f"system build: {time.time()-t0:.0f} s", flush=True)

    t0 = time.time()
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-9, verbose=True)
    assert res["converged"]
    print(f"LDA SCF: {time.time()-t0:.0f} s  E = {res['e_tot']:.9f}",
          flush=True)

    nocc = system.nelec // 2
    C_w = np.asarray(res["mo_coeff"])[:, :nocc] * np.sqrt(2.0)
    out = os.path.join(os.path.dirname(__file__), "density_333.npz")
    np.savez_compressed(out, C_w=C_w, e_tot=res["e_tot"],
                        mesh=np.asarray(cell.mesh), nocc=nocc)
    print(f"saved {out} (C_w {C_w.shape})", flush=True)


if __name__ == "__main__":
    main()
