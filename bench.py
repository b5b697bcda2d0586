"""Benchmark: ISDF vs FFTDF exchange+Coulomb build on diamond 2x2x2 (TPU).

The BASELINE.json headline metric: per-SCF-iteration J+K wall-clock on the
diamond 2x2x2 supercell — the reference's FFTDF algorithm (per-iteration
O(nao * ngrids) pair-density FFTs, pyscf/pbc/df/fft_jk.py:276-291,
reimplemented on-device as the oracle) vs this framework's ISDF engine
(one-time W build, then GEMM-cost exchange).

Timing methodology: N SCF-like iterations chained inside ONE jitted
fori_loop (the deployment shape — a jitted SCF loop), so per-call dispatch
latency of the host<->TPU link is amortized away.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
value = ISDF J+K per-iteration wall time (ms); vs_baseline = speedup over
the FFTDF J+K build on the same device.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pyscf_isdf_tpu_jax"))

N_ITER = int(os.environ.get("BENCH_N_ITER", 100))      # ISDF marginal spread
N_ITER_ORACLE = int(os.environ.get("BENCH_N_ORACLE", 4))  # FFTDF marginal spread


def timeit(fn, *args, warmup=1, reps=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chained(jk):
    """Damped Fock-mixing iterations; the trip count is a RUNTIME argument,
    so one compilation serves every n and the marginal per-iteration cost
    (T(n2) - T(n1)) / (n2 - n1) cancels dispatch latency and one-time
    costs exactly."""
    def run(dm, n):
        def body(i, d):
            vj, vk = jk(d)
            f = vj - 0.5 * vk
            nao = d.shape[0]
            return d + 1e-6 * (f - jnp.trace(f) / nao * jnp.eye(nao, dtype=d.dtype))
        return jax.lax.fori_loop(0, n, body, dm)
    return jax.jit(run)


def marginal_time(fn, dm, n1, n2, reps=5):
    for _ in range(1):
        jax.block_until_ready(fn(dm, n2))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(dm, n1))
        t1 = time.perf_counter()
        jax.block_until_ready(fn(dm, n2))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(ts))


def main():
    from pyscf_isdf_tpu.models import diamond_supercell
    from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
    from pyscf_isdf_tpu.ops import coulomb
    from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dtype = jnp.float32
    if "--large" in sys.argv:
        # the BASELINE north-star scale (diamond 3x3x3)
        nrep, mesh, name = (3, 3, 3), (48, 48, 48), "diamond333"
    else:
        nrep, mesh, name = (2, 2, 2), (32, 32, 32), "diamond222"
    cell = diamond_supercell(nrep=nrep, mesh=mesh)
    log(f"system: {name}, natm={cell.natm} nao={cell.nao} "
        f"ngrids={cell.ngrids} mesh={cell.mesh}")

    t0 = time.perf_counter()
    from pyscf_isdf_tpu.ops.pallas_ao import make_ao_evaluator
    evaluator = make_ao_evaluator(cell, dtype=dtype)
    aoR = evaluator()
    jax.block_until_ready(aoR)
    coulG = jnp.asarray(coulomb.get_coulG(cell), dtype)
    log(f"aoR (Pallas) + kernels build: {time.perf_counter()-t0:.1f} s")

    mesh3 = tuple(cell.mesh)
    w = cell.grid_weight
    nao = cell.nao
    dm = jnp.asarray(2.0 / nao * np.eye(nao), dtype)

    t0 = time.perf_counter()
    isdf = isdf_mod.build_isdf(aoR, coulG, mesh3, w, c=8.0)
    jax.block_until_ready(isdf.W)
    log(f"ISDF build (n_ip={isdf.n_ip}): {time.perf_counter()-t0:.2f} s "
        "(incl compile)")

    jk_isdf = lambda d: (fftdf.get_j(aoR, d, coulG, mesh3, w),
                         isdf_mod.get_k(isdf, d))
    jk_fftdf = lambda d: (fftdf.get_j(aoR, d, coulG, mesh3, w),
                          fftdf.get_k(aoR, d, coulG, mesh3, w, chunk=8))

    f_isdf = chained(jk_isdf)
    f_fftdf = chained(jk_fftdf)
    t0 = time.perf_counter()
    t_isdf = marginal_time(f_isdf, dm, 2, 2 + N_ITER)
    log(f"isdf chain compile+time: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    t_fftdf = marginal_time(f_fftdf, dm, 1, 1 + N_ITER_ORACLE)
    log(f"fftdf chain compile+time: {time.perf_counter()-t0:.1f} s")

    # numerics check on the exchange energy
    vk_ref = jax.jit(lambda d: fftdf.get_k(aoR, d, coulG, mesh3, w))(dm)
    vk_new = jax.jit(lambda d: isdf_mod.get_k(isdf, d))(dm)
    dek = abs(float(jnp.einsum("ij,ji->", dm, vk_ref - vk_new)))
    log(f"FFTDF J+K per iter: {t_fftdf*1e3:.2f} ms; "
        f"ISDF J+K per iter: {t_isdf*1e3:.2f} ms; "
        f"speedup {t_fftdf/t_isdf:.1f}x; |dEk|={dek:.2e} Ha")

    print(json.dumps({
        "metric": f"{name}_jk_per_scf_iter_ms",
        "value": round(t_isdf * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(t_fftdf / t_isdf, 2),
    }))


if __name__ == "__main__":
    main()
