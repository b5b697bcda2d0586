"""Measured MFU / roofline evidence for the bench kernels (VERDICT r3 #4).

SURVEY's north-star row demands the three bench kernels sit at the
memory/MXU roofline of the chip, "measured, not derived". Two layers of
evidence, both MEASURED on the attached TPU:

1. Device capability probes — an HBM streaming kernel (grid-sized copy+
   reduce) and a dense f32 GEMM chain — give the ACHIEVABLE peak
   bandwidth and matmul throughput of this chip through this runtime
   (stronger than quoting spec sheets: the axon relay, XLA version and
   f32-on-MXU precision policy are all priced in).
2. The three bench kernels (ISDF plain-K GEMMs, robust cross-term,
   FFTDF-K) run at the real diamond-3x3x3 bench shapes with the same
   chained-fori_loop marginal timing bench.py uses; their FLOP and HBM
   byte counts come from XLA's own cost model (compiled.cost_analysis(),
   the compiler's numbers for the exact HLO executed — not hand
   arithmetic), falling back to labeled analytic counts only if the
   relay's PJRT client lacks cost analysis.

Utilization = measured kernel throughput / measured probe peak, per the
kernel's binding resource. Also attempts jax.profiler.start_trace and
records whether a device-side trace is supported through the tunnel
(artifact saved under tools/traces/ when it is).

Usage:  python tools/mfu_trace.py [--out PROFILE_r4.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pyscf_isdf_tpu_jax"))

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def _sync(x):
    """Host-read barrier (bench.py semantics: block_until_ready can
    return before work runs on the tunneled runtime)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.real(leaf).ravel()[0])


def marginal(fn, args, n1=2, n2=12, reps=3):
    """(T(n2)-T(n1))/(n2-n1) with a runtime trip count — cancels
    dispatch and one-time costs (bench.py methodology)."""
    _sync(fn(n2, *args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(n1, *args))
        t1 = time.perf_counter()
        _sync(fn(n2, *args))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(ts))


def chain(body_fn):
    """Chained fori_loop: body must map carry -> carry, data-dependent."""
    def run(n, carry, *ops):
        return jax.lax.fori_loop(
            0, n, lambda i, c: body_fn(c, *ops), carry)
    return jax.jit(run)


def cost_of(fn, n, *args):
    """XLA cost model for the exact compiled HLO (per loop trip:
    divide by n outside). None if the PJRT client lacks the API."""
    try:
        c = jax.jit(fn).lower(n, *args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {"flops": float(c.get("flops", -1)),
                "bytes": float(c.get("bytes accessed", -1))}
    except Exception as e:  # axon relay may not expose cost analysis
        log(f"  cost_analysis unavailable: {type(e).__name__}: "
            f"{str(e)[:120]}")
        return None


def main():
    out_path = "PROFILE_r4.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    dev = jax.devices()[0]
    log(f"device: {dev}")
    results = {"device": str(dev)}

    # ---------------------------------------------------------- probes
    # HBM streaming peak: out = a + b over 1 GiB operands. Traffic per
    # trip = read a + read b + write out = 3 * 1 GiB (the carry is `a`,
    # so the chain stays data-dependent).
    N = 1 << 28                                   # 1 GiB f32
    a = jnp.ones((N,), jnp.float32)
    b = jnp.full((N,), 0.5, jnp.float32)

    stream = chain(lambda c, bb: c + bb)
    t = marginal(stream, (a, b), n1=2, n2=8)
    bw = 3 * N * 4 / t / 1e9
    results["probe_hbm_GBs"] = round(bw, 1)
    log(f"HBM streaming probe: {t*1e3:.2f} ms/trip -> {bw:.0f} GB/s")

    # MXU peak: square f32 GEMM chain at the JAX default matmul
    # precision (the same policy every framework kernel runs under).
    M = 8192
    g = jnp.asarray(np.random.default_rng(0).standard_normal(
        (M, M)) * (1.0 / M), jnp.float32)

    gemm = chain(lambda c, gg: gg @ c)
    t = marginal(gemm, (g, g), n1=2, n2=8)
    tf = 2 * M**3 / t / 1e12
    results["probe_mxu_TFLOPs"] = round(tf, 1)
    log(f"GEMM probe ({M}x{M}): {t*1e3:.2f} ms -> {tf:.0f} TFLOP/s")

    # ------------------------------------------------- bench kernels
    # Real diamond-3x3x3 bench shapes (bench.py, certified c=32 config)
    ng, nao, nip = 110592, 216, 6912
    mesh3 = (48, 48, 48)
    w = 1e-2
    rng = np.random.default_rng(1)
    aoR = jnp.asarray(rng.standard_normal((ng, nao)) * 0.05, jnp.float32)
    aoRg = jnp.asarray(rng.standard_normal((nip, nao)) * 0.05, jnp.float32)
    W = jnp.asarray(rng.standard_normal((nip, nip)) * 1e-3, jnp.float32)
    Vxi = jnp.asarray(rng.standard_normal((nip, ng)) * 1e-3, jnp.float32)
    coulG = jnp.asarray(rng.random(ng) * 1e-2, jnp.float32)
    dm = jnp.asarray(2.0 / nao * np.eye(nao), jnp.float32)

    def damp(d, f):
        return d + 1e-6 * (f - jnp.trace(f) / nao
                           * jnp.eye(nao, dtype=d.dtype))

    def k_plain(d, aoRg, W):
        # ISDF plain-K GEMM segment (df/isdf.py get_k)
        M_ = aoRg @ d @ aoRg.T
        return aoRg.T @ (W * M_) @ aoRg

    def k_cross(d, aoR, aoRg, Vxi):
        # robust cross-term (df/isdf.py get_k_robust T1, XLA path)
        B = aoRg @ d
        t_ = aoR @ B.T
        Z = Vxi.T * t_
        return w * (aoRg.T @ (Z.T @ aoR))

    from pyscf_isdf_tpu.df import fftdf

    def k_fftdf(d, aoR, coulG):
        return fftdf.get_k(aoR, d, coulG, mesh3, w, chunk=8)

    kernels = {
        "isdf_k_plain": (k_plain, (aoRg, W),
                         # analytic fallback: 2 big GEMMs + hadamard
                         dict(flops=2 * 2 * nip * nip * nao,
                              bytes=(2 * nip * nip + 4 * nip * nao) * 4)),
        "robust_cross": (k_cross, (aoR, aoRg, Vxi),
                         dict(flops=2 * 2 * ng * nao * nip,
                              bytes=(3 * ng * nip + 2 * ng * nao) * 4)),
        "fftdf_k": (k_fftdf, (aoR, coulG),
                    # nao pair-FFT roundtrips: 2 c64 3D FFTs per AO row
                    dict(flops=2 * nao * 5 * ng * np.log2(ng),
                         bytes=2 * nao * 2 * ng * 8)),
    }

    n_loop = {"isdf_k_plain": (4, 104), "robust_cross": (4, 54),
              "fftdf_k": (1, 3)}
    for name, (kfn, ops, fallback) in kernels.items():
        f = chain(lambda d, *o, _k=kfn: damp(d, _k(d, *o)))
        n1, n2 = n_loop[name]
        t = marginal(f, (dm,) + ops, n1=n1, n2=n2,
                     reps=3 if name != "fftdf_k" else 2)
        # per-trip compiler counts: cost(n2) - cost(n1) over the delta
        c2 = cost_of(lambda n, d, *o, _f=f: _f(n, d, *o), n2, dm, *ops)
        entry = {"ms_per_iter": round(t * 1e3, 3)}
        if c2 is not None and c2["flops"] > 0:
            # fori_loop cost scales with trip count only if XLA unrolls;
            # with a runtime trip count the body is counted once
            entry["xla_flops_per_iter"] = c2["flops"]
            entry["xla_bytes_per_iter"] = c2["bytes"]
            fl, by = c2["flops"], c2["bytes"]
        else:
            entry["analytic_flops_per_iter"] = fallback["flops"]
            entry["analytic_bytes_per_iter"] = fallback["bytes"]
            fl, by = fallback["flops"], fallback["bytes"]
        entry["TFLOPs"] = round(fl / t / 1e12, 1)
        entry["GBs"] = round(by / t / 1e9, 1)
        entry["mxu_util_vs_probe"] = round(fl / t / 1e12
                                           / results["probe_mxu_TFLOPs"], 3)
        entry["hbm_util_vs_probe"] = round(by / t / 1e9
                                           / results["probe_hbm_GBs"], 3)
        results[name] = entry
        log(f"{name}: {t*1e3:.3f} ms/iter  {entry['TFLOPs']} TFLOP/s "
            f"({entry['mxu_util_vs_probe']:.0%} of probe peak)  "
            f"{entry['GBs']} GB/s ({entry['hbm_util_vs_probe']:.0%})")

    # ------------------------------------------------ profiler trace
    tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "traces", "r4")
    try:
        os.makedirs(tdir, exist_ok=True)
        jax.profiler.start_trace(tdir)
        _sync(chain(lambda d, g_: damp(d, k_plain(d, aoRg, W)))(8, dm, g))
        jax.profiler.stop_trace()
        files = []
        for root, _, fs in os.walk(tdir):
            files += [os.path.join(root, f) for f in fs]
        has_device = any("xplane" in f for f in files)
        results["profiler_trace"] = {
            "captured": True, "device_plane": has_device,
            "files": [os.path.relpath(f, tdir) for f in files][:8]}
        log(f"profiler trace captured: {len(files)} files, "
            f"device plane present: {has_device}")
    except Exception as e:
        results["profiler_trace"] = {
            "captured": False,
            "detail": f"{type(e).__name__}: {str(e)[:200]}"}
        log(f"profiler trace NOT captured: {type(e).__name__}: "
            f"{str(e)[:200]}")

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
