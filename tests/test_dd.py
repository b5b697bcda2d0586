"""Double-float (dd) arithmetic: exactness of the EFTs under XLA and
f64-parity of the dd linear algebra (ops/dd.py).

These tests pin that XLA preserves IEEE f32 semantics for the
error-free transformations (no fast-math reassociation) — if any of the
exactness checks here ever fails after a JAX/XLA upgrade, the dd ISDF
build path is numerically void and must not be trusted.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu.ops import dd

rng = np.random.default_rng(7)


def _rand_f32(*shape, scale=1.0):
    return np.asarray(rng.standard_normal(shape) * scale, np.float32)


def test_two_sum_exact():
    a = _rand_f32(1000)
    b = _rand_f32(1000, scale=1e-4)
    s, e = jax.jit(dd.two_sum)(a, b)
    # exactness: s + e == a + b in f64 (both representable sums)
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_two_prod_exact():
    a = _rand_f32(1000)
    b = _rand_f32(1000)
    p, e = jax.jit(dd.two_prod)(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_dd_add_mul_accuracy():
    # dd ops keep ~2^-48 relative accuracy vs f64
    xh, xl = dd.from_f64(rng.standard_normal(500) * 3.0)
    yh, yl = dd.from_f64(rng.standard_normal(500) * 0.1)
    x, y = dd.dd_to_f64(xh, xl), dd.dd_to_f64(yh, yl)
    sh, sl = jax.jit(dd.add)(xh, xl, yh, yl)
    np.testing.assert_allclose(dd.dd_to_f64(sh, sl), x + y, rtol=1e-13)
    ph, pl = jax.jit(dd.mul)(xh, xl, yh, yl)
    np.testing.assert_allclose(dd.dd_to_f64(ph, pl), x * y, rtol=1e-12)
    qh, ql = jax.jit(dd.div)(xh, xl, yh, yl)
    np.testing.assert_allclose(dd.dd_to_f64(qh, ql), x / y, rtol=1e-12)


def test_dd_sqrt():
    x = np.abs(rng.standard_normal(300)) + 0.01
    xh, xl = dd.from_f64(x)
    sh, sl = jax.jit(dd.sqrt)(xh, xl)
    np.testing.assert_allclose(dd.dd_to_f64(sh, sl), np.sqrt(x),
                               rtol=1e-12)


def test_fused_scan_accumulation_exact():
    """Regression: XLA fuses a producer multiply into the EFT's first
    add as an FMA (codegen-level contraction), silently breaking
    two_sum inside scan bodies — pinned here by an end-to-end dd dot
    accumulated in a fused jit scan (caught live: lo-word corruption to
    ~1e-7 relative without the x + x*0 fences; optimization_barrier is
    stripped before fusion on XLA:CPU and does NOT protect this)."""
    a = _rand_f32(200)
    b = _rand_f32(200)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)

    @jax.jit
    def dot_dd(a, b):
        def body(c, gb):
            ph, pl = dd.two_prod(gb[0], gb[1])
            return dd.add(c[0], c[1], ph, pl), None

        z = jnp.zeros((), a.dtype)
        (sh, sl), _ = jax.lax.scan(body, (z, z), (a, b))
        return sh, sl

    sh, sl = dot_dd(jnp.asarray(a), jnp.asarray(b))
    err = abs(dd.dd_to_f64(np.asarray(sh), np.asarray(sl)) - ref)
    assert err < 1e-12 * max(1.0, abs(ref))


def test_sum_dd_pairwise():
    x = rng.standard_normal((1000, 3))
    xh, xl = dd.from_f64(x)
    sh, sl = jax.jit(lambda h, l: dd.sum_dd(h, l, axis=0))(
        jnp.asarray(xh), jnp.asarray(xl))
    np.testing.assert_allclose(dd.dd_to_f64(sh, sl), x.sum(0), rtol=1e-12,
                               atol=1e-12)


def test_matmul_exact_dd_vs_f64():
    A = _rand_f32(300, 40)
    B = _rand_f32(40, 200)
    Ch, Cl = dd.matmul_exact_dd(A, B, row_chunk=128)
    ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
    np.testing.assert_allclose(dd.dd_to_f64(Ch, Cl), ref,
                               rtol=1e-11, atol=1e-11)


def test_matmul_f32_dd_chunked():
    # chunked MXU path: error set by the chunk, far below plain f32
    A = _rand_f32(64, 4096)
    B = _rand_f32(4096, 64)
    ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
    Ch, Cl = dd.matmul_f32_dd(A, B, chunk=128)
    err_dd = np.abs(dd.dd_to_f64(Ch, Cl) - ref).max()
    err_f32 = np.abs(np.asarray(A @ B, np.float64) - ref).max()
    scale = np.abs(ref).max()
    assert err_dd / scale < 3e-6        # chunk-bounded
    assert err_dd <= err_f32 * 1.5      # never worse than plain f32


def test_cholesky_dd_vs_f64():
    n = 80
    X = rng.standard_normal((n, 4 * n))
    # ill-conditioned PSD test matrix (squared Gram, like the ISDF C1)
    G = (X @ X.T)
    G = (G * G)
    G += 1e-9 * np.trace(G) / n * np.eye(n)
    L64 = np.linalg.cholesky(G)
    Gh, Gl = dd.from_f64(G)
    Lh, Ll = dd.cholesky_dd(jnp.asarray(Gh), jnp.asarray(Gl))
    L = dd.dd_to_f64(Lh, Ll)
    np.testing.assert_allclose(L, L64, rtol=5e-7, atol=5e-7 * L64.max())
    # the factorization residual is the real bar: ||L L^T - G|| tiny
    res = np.abs(L @ L.T - G).max() / np.abs(G).max()
    assert res < 1e-11


def test_tril_inverse_dd():
    n = 60
    L = np.tril(rng.standard_normal((n, n)) * 0.3)
    np.fill_diagonal(L, np.abs(np.diag(L)) + 1.0)
    Lh, Ll = dd.from_f64(L)
    Xh, Xl = dd.tril_inverse_dd(jnp.asarray(Lh), jnp.asarray(Ll))
    X = dd.dd_to_f64(Xh, Xl)
    res = np.abs(L @ X - np.eye(n)).max()
    assert res < 1e-11


def test_matmul_dd_dd():
    A = rng.standard_normal((50, 300))
    B = rng.standard_normal((300, 40))
    Ah, Al = dd.from_f64(A)
    Bh, Bl = dd.from_f64(B)
    Ch, Cl = dd.matmul_dd_dd(jnp.asarray(Ah), jnp.asarray(Al),
                             jnp.asarray(Bh), jnp.asarray(Bl), chunk=64)
    ref = A @ B
    np.testing.assert_allclose(dd.dd_to_f64(Ch, Cl), ref,
                               rtol=2e-7, atol=2e-7 * np.abs(ref).max())
