"""Benchmark: ISDF vs FFTDF exchange+Coulomb build on diamond 2x2x2 (TPU).

The BASELINE.json headline metric: ISDF build + per-SCF-iteration J/K
wall-clock on the diamond 2x2x2 supercell vs the FFTDF algorithm (the
reference's per-iteration O(nao * ngrids) pair-density FFT loop,
pyscf/pbc/df/fft_jk.py:276-291 — here reimplemented on-device as the
oracle), with matching numerics.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
where value is the ISDF per-iteration J+K wall time and vs_baseline is the
speedup over the FFTDF J+K build on the same device.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, warmup=2, reps=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from pyscf_isdf_tpu.models import diamond_supercell
    from pyscf_isdf_tpu.scf import build_scf_system
    from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod

    dtype = jnp.float32
    cell = diamond_supercell(nrep=(2, 2, 2), mesh=(32, 32, 32))
    log = lambda *a: print(*a, file=sys.stderr)
    log(f"system: diamond 2x2x2, natm={cell.natm} nao={cell.nao} "
        f"ngrids={cell.ngrids} mesh={cell.mesh}")

    t0 = time.perf_counter()
    system = build_scf_system(cell, dtype=dtype)
    log(f"host build (hcore/S/ewald/aoR): {time.perf_counter()-t0:.1f} s")

    mesh3 = tuple(cell.mesh)
    weight = cell.grid_weight
    aoR = system.aoR
    coulG = jnp.asarray(system.coulG, dtype)
    nao = cell.nao
    dm = jnp.asarray(2.0 / nao * np.eye(nao), dtype)

    # --- ISDF build (one-time per geometry) ---
    t0 = time.perf_counter()
    isdf = isdf_mod.build_isdf(aoR, coulG, mesh3, weight, c=8.0)
    jax.block_until_ready(isdf.W)
    t_build = time.perf_counter() - t0
    log(f"ISDF build (n_ip={isdf.n_ip}): {t_build:.2f} s")

    # --- per-iteration J+K: FFTDF oracle vs ISDF ---
    def jk_fftdf(d):
        vj = fftdf.get_j(aoR, d, coulG, mesh3, weight)
        vk = fftdf.get_k(aoR, d, coulG, mesh3, weight)
        return vj, vk

    def jk_isdf(d):
        vj = fftdf.get_j(aoR, d, coulG, mesh3, weight)  # exact J kept
        vk = isdf_mod.get_k(isdf, d)
        return vj, vk

    jk_fftdf_j = jax.jit(jk_fftdf)
    jk_isdf_j = jax.jit(jk_isdf)

    t_fftdf = timeit(jk_fftdf_j, dm)
    t_isdf = timeit(jk_isdf_j, dm)

    # numerics check: exchange energies must agree
    _, vk_ref = jk_fftdf_j(dm)
    _, vk_new = jk_isdf_j(dm)
    ek_ref = float(jnp.einsum("ij,ji->", dm, vk_ref))
    ek_new = float(jnp.einsum("ij,ji->", dm, vk_new))
    log(f"FFTDF J+K per iter: {t_fftdf*1e3:.2f} ms; "
        f"ISDF J+K per iter: {t_isdf*1e3:.2f} ms; "
        f"speedup {t_fftdf/t_isdf:.1f}x; |dEk|={abs(ek_ref-ek_new):.2e} Ha")

    print(json.dumps({
        "metric": "diamond222_jk_per_scf_iter_ms",
        "value": round(t_isdf * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(t_fftdf / t_isdf, 2),
    }))


if __name__ == "__main__":
    main()
