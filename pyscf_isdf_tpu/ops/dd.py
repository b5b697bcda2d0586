"""Double-float ("double-double" on f32) arithmetic for TPU.

TPUs have no hardware float64; the ISDF build needs better-than-f32
precision in exactly three places (measured in BENCH_NOTES r3: the f32
build is a 30x worse METHOD than the f64 build at diamond 2x2x2 c=16 —
9.4e-4 vs 3.18e-5 Ha — because the near-singular squared Gram demands an
f32-scale regularization shift):

  1. the squared-Gram matrices C1 = (A A^T)**2, C2 = (B A^T)**2,
  2. the regularized Cholesky factorization of C1,
  3. the application of the inverse factor to the grid-sized RHS.

This module provides error-free-transformation based double-float
(hi, lo) arithmetic — each value is an unevaluated sum of two f32s,
~48 significand bits — plus the three linear-algebra kernels above.
Elementwise dd ops run on the VPU; the large GEMMs stay on the MXU via
HIGHEST-precision f32 contractions (exact bf16x6 products) accumulated
chunk-wise in dd, so the K-length accumulation rounding that caps a
plain f32 GEMM at ~sqrt(K)*2^-24 relative error is pushed down to the
chunk length.

References: Dekker 1971 (two_sum/split/two_prod), Hida-Li-Bailey 2001
(dd algorithms). Classical algorithms implemented fresh for JAX/XLA —
all ops are elementwise-vectorized and jit/scan safe (no data-dependent
control flow). The TPU consumer is the ISDF build (df/isdf.py,
precision='dd'), replacing the host-staged f64 build of
tools/certify_sym.py for arbitrary (non-supercell) geometries.

IMPORTANT: these transformations rely on IEEE-754 rounding of each
individual f32 add/mul. XLA:CPU's fused-loop codegen breaks this via
FMA contraction; every vulnerable value is pinned by the contraction-
proof `_fence` below, and tests/test_dd.py asserts bit-exactness so
any compiler regression fails loudly.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST

# Dekker split constant for f32 (2^12 + 1): splits a 24-bit significand
# into two 12-bit halves whose pairwise products are exact in f32.
_SPLIT_F32 = np.float32(4097.0)


# ----------------------------------------------------------------- EFTs
#
# EFT exactness requires every value to be a *rounded f32*. XLA:CPU's
# codegen (LLVM, contract=fast in the fused-loop emitters; measured on
# jax 0.9.0, not disableable via xla_cpu_enable_fast_math /
# xla_allow_excess_precision) contracts a producer multiply with the
# consuming add/sub into an FMA — e.g. two_sum(acc, a*b) becomes
# s = fma(a, b, acc) != fl(acc + fl(a*b)) — silently voiding the error
# recovery (measured: lo-word corruption to ~f32 level in fused bodies;
# optimized-HLO inspection shows lax.optimization_barrier is stripped
# BEFORE fusion on CPU, and kLoop fusions re-materialize the multiply
# inside the consumer, so barriers do not protect the pattern).
#
# _fence(x) = x + x*0 defeats this *semantically* rather than by
# pass-ordering luck: whatever LLVM contracts —
#     no contraction:      fl(fl(x) + 0)          = fl(x)
#     fma(x, 0, x):        fl(x*0 + x)            = fl(x)
#     producer mul fused:  fl(exact(a*b) + 0)     = fl(a*b)
# — the result is the correctly rounded value, and the fence's own
# output is an ADD, which cannot contract into a downstream add. The
# only values that need fencing are products feeding an EFT add (p in
# two_prod, t in _split, and EFT entry inputs); Dekker's half-products
# (ah*bh etc.) are exactly representable, so FMA inside the e-expression
# is harmless. tests/test_dd.py pins all of this with exactness checks.
# Caveat: x must be finite (x*0 = NaN for inf), true on every dd path.
def _fence(x):
    return x + x * jnp.zeros((), jnp.result_type(x))


def two_sum(a, b):
    """s + e == a + b exactly (Knuth; no magnitude precondition)."""
    a, b = _fence(a), _fence(b)
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (or a == 0)."""
    a, b = _fence(a), _fence(b)
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    a = _fence(a)
    t = _fence(_SPLIT_F32 * a)
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker; no FMA needed)."""
    p = _fence(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ------------------------------------------------------------ dd scalar
def add(xh, xl, yh, yl):
    """dd + dd (accurate variant, Hida-Li-Bailey add_dd_dd)."""
    sh, sl = two_sum(xh, yh)
    th, tl = two_sum(xl, yl)
    sl = sl + th
    sh, sl = fast_two_sum(sh, sl)
    sl = sl + tl
    return fast_two_sum(sh, sl)


def add_f(xh, xl, y):
    """dd + f32."""
    sh, sl = two_sum(xh, y)
    return fast_two_sum(sh, sl + xl)


def neg(xh, xl):
    return -xh, -xl


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def mul(xh, xl, yh, yl):
    """dd * dd."""
    ph, pl = two_prod(xh, yh)
    pl = pl + (xh * yl + xl * yh)
    return fast_two_sum(ph, pl)


def mul_f(xh, xl, y):
    """dd * f32."""
    ph, pl = two_prod(xh, y)
    return fast_two_sum(ph, pl + xl * y)


def div(xh, xl, yh, yl):
    """dd / dd (two Newton corrections on the f32 quotient)."""
    q1 = xh / yh
    rh, rl = sub(xh, xl, *mul_f(yh, yl, q1))
    q2 = rh / yh
    rh, rl = sub(rh, rl, *mul_f(yh, yl, q2))
    q3 = rh / yh
    qh, ql = fast_two_sum(q1, q2)
    return add_f(qh, ql, q3)


def sqrt(xh, xl):
    """dd sqrt (Karp-Markstein style: one correction on f32 sqrt).

    For xh <= 0 returns 0 (the Cholesky regularization guarantees
    positive pivots; the guard keeps the masked lanes finite).
    """
    ok = xh > 0
    s = jnp.sqrt(jnp.where(ok, xh, 1.0))
    # e = (x - s*s) / (2 s), done in dd for the residual
    s2h, s2l = two_prod(s, s)
    rh, rl = sub(xh, xl, s2h, s2l)
    e = rh / (2.0 * s)
    h, l = fast_two_sum(s, e)
    return jnp.where(ok, h, 0.0), jnp.where(ok, l, 0.0)


def to_f32(xh, xl):
    return xh + xl


def from_f64(x64):
    """Split a host f64 array into a dd pair (for tests/staging)."""
    hi = np.asarray(x64, np.float32)
    lo = np.asarray(np.asarray(x64, np.float64) - hi, np.float32)
    return hi, lo


def dd_to_f64(xh, xl):
    return np.asarray(xh, np.float64) + np.asarray(xl, np.float64)


# ------------------------------------------------------- dd GEMM kernels
@partial(jax.jit, static_argnames=("chunk",))
def matmul_f32_dd(A, B, chunk: int = 128):
    """C = A @ B with dd-accurate accumulation; A (m,k), B (k,n) f32.

    Each k-chunk is contracted on the MXU at HIGHEST precision (bf16x6:
    products exact, in-chunk accumulation rounds at ~chunk*2^-24) and the
    chunk partials are summed exactly in dd, so the result error is set
    by the chunk length, not K. Returns (Chi, Clo).
    """
    m, k = A.shape
    n = B.shape[1]
    npad = (-k) % chunk
    if npad:
        A = jnp.pad(A, ((0, 0), (0, npad)))
        B = jnp.pad(B, ((0, npad), (0, 0)))
    Ac = A.reshape(m, -1, chunk).transpose(1, 0, 2)      # (nc, m, chunk)
    Bc = B.reshape(-1, chunk, n)                          # (nc, chunk, n)

    def body(carry, ab):
        ch, cl = carry
        a, b = ab
        p = jnp.dot(a, b, precision=HIGHEST)
        ch, cl = add_f(ch, cl, p)
        return (ch, cl), None

    z = jnp.zeros((m, n), A.dtype)
    (ch, cl), _ = jax.lax.scan(body, (z, z), (Ac, Bc))
    return ch, cl


def sum_dd(Xh, Xl, axis=0):
    """Pairwise dd reduction along ``axis`` (log-depth, dd-exact adds)."""
    Xh = jnp.moveaxis(Xh, axis, 0)
    Xl = jnp.moveaxis(Xl, axis, 0)
    while Xh.shape[0] > 1:
        m = Xh.shape[0]
        if m % 2:
            pad = [(0, 1)] + [(0, 0)] * (Xh.ndim - 1)
            Xh, Xl = jnp.pad(Xh, pad), jnp.pad(Xl, pad)
            m += 1
        Xh, Xl = add(Xh[: m // 2], Xl[: m // 2],
                     Xh[m // 2:], Xl[m // 2:])
    return Xh[0], Xl[0]


@partial(jax.jit, static_argnames=("chunk",))
def matmul_dd_dd(Ah, Al, Bh, Bl, chunk: int = 128):
    """dd (m,k) @ dd (k,n) -> dd, MXU for all three significant products.

    C = Ah Bh (dd-accumulated) + Ah Bl + Al Bh; the Al Bl term is below
    the dd working precision (2^-48) and dropped.

    NOTE this is the FAST tier: the hi*hi chunk GEMMs still round their
    in-chunk accumulation at f32, so the result carries ~chunk * 2^-24 /
    sqrt(n_chunks) relative error (~1e-7 at chunk=128) — far better than
    plain f32 over a long K, but NOT full dd. Use the elementwise exact
    path (matmul_exact_dd / the dd factorizations below) where dd-grade
    accuracy is required.
    """
    ch, cl = matmul_f32_dd(Ah, Bh, chunk=chunk)
    cross = jnp.dot(Ah, Bl, precision=HIGHEST) \
        + jnp.dot(Al, Bh, precision=HIGHEST)
    return add(ch, cl, cross, jnp.zeros_like(cross))


@partial(jax.jit, static_argnames=("chunk",))
def gram_dd(A, chunk: int = 128):
    """G = A @ A.T in dd from an f32 A (m, k)."""
    return matmul_f32_dd(A, A.T, chunk=chunk)


def square_dd(Gh, Gl):
    """Elementwise square of a dd array (the ISDF squared Gram)."""
    return mul(Gh, Gl, Gh, Gl)


@partial(jax.jit, static_argnames=("row_chunk",))
def gram_cdd(Ar, Ai, row_chunk: int = 512):
    """G = A @ A^H in COMPLEX dd from f32 real/imag parts (m, k).

    The complex analog of :func:`gram_dd` for the k-point ISDF Grams
    (contraction over the short nk*nao / nao axis, so the exact
    elementwise path applies): Re G = Ar Ar^T + Ai Ai^T,
    Im G = Ai Ar^T - Ar Ai^T. Returns (Grh, Grl, Gih, Gil); G is
    Hermitian (Re symmetric, Im antisymmetric) up to exact dd rounding.
    """
    rh1, rl1 = matmul_exact_dd(Ar, Ar.T, row_chunk=row_chunk)
    rh2, rl2 = matmul_exact_dd(Ai, Ai.T, row_chunk=row_chunk)
    Grh, Grl = add(rh1, rl1, rh2, rl2)
    ih1, il1 = matmul_exact_dd(Ai, Ar.T, row_chunk=row_chunk)
    ih2, il2 = matmul_exact_dd(Ar, Ai.T, row_chunk=row_chunk)
    Gih, Gil = sub(ih1, il1, ih2, il2)
    return Grh, Grl, Gih, Gil


@partial(jax.jit, static_argnames=("row_chunk",))
def matmul_exact_dd(A, B, row_chunk: int = 512):
    """C = A @ B in FULL dd accuracy for SMALL contraction lengths.

    A (m, k) f32, B (k, n) f32, k small (the ISDF Gram's k = nao).
    Every scalar product is an exact two_prod and the k-length sum is a
    dd accumulation — elementwise on the VPU, O(m n k) dd flops, so only
    viable when k is O(100). For large k use matmul_f32_dd (MXU, chunked
    compensation). Returns (Chi, Clo).
    """
    m, k = A.shape
    n = B.shape[1]
    npad = (-m) % row_chunk
    A_p = jnp.pad(A, ((0, npad), (0, 0))) if npad else A

    def per_block(a):                                     # (rc, k)
        def body(carry, gb):
            sh, sl = carry
            ag, bg = gb                                   # (rc,), (n,)
            ph, pl = two_prod(ag[:, None], bg[None, :])
            sh, sl = add(sh, sl, ph, pl)
            return (sh, sl), None

        z = jnp.zeros((a.shape[0], n), A.dtype)
        (sh, sl), _ = jax.lax.scan(body, (z, z), (a.T, B))
        return sh, sl

    Ch, Cl = jax.lax.map(per_block, A_p.reshape(-1, row_chunk, k))
    return Ch.reshape(-1, n)[:m], Cl.reshape(-1, n)[:m]


# ------------------------------------------------------ dd Cholesky etc.
@jax.jit
def cholesky_dd(Ah, Al):
    """Right-looking dd Cholesky of a symmetric PSD dd matrix (n, n).

    n sequential steps, each a vectorized O(n^2) dd rank-1 downdate on
    the VPU — O(n^3) total, acceptable for the (n_ip, n_ip) ISDF Gram
    (one-time build cost). Returns lower-triangular (Lh, Ll).
    """
    n = Ah.shape[0]
    idx = jnp.arange(n)

    def body(j, state):
        Ch, Cl, Lh, Ll = state
        dh, dl = Ch[j, j], Cl[j, j]
        sh, sl = sqrt(dh, dl)
        colh, coll = Ch[:, j], Cl[:, j]
        vh, vl = div(colh, coll, sh, sl)
        below = idx > j
        vh = jnp.where(below, vh, 0.0)
        vl = jnp.where(below, vl, 0.0)
        # trailing update C -= v v^T (dd outer product)
        oh, ol = mul(vh[:, None], vl[:, None], vh[None, :], vl[None, :])
        Ch, Cl = sub(Ch, Cl, oh, ol)
        lcol_h = jnp.where(idx == j, sh, vh)
        lcol_l = jnp.where(idx == j, sl, vl)
        Lh = Lh.at[:, j].set(lcol_h)
        Ll = Ll.at[:, j].set(lcol_l)
        return Ch, Cl, Lh, Ll

    z = jnp.zeros_like(Ah)
    _, _, Lh, Ll = jax.lax.fori_loop(0, n, body, (Ah, Al, z, z))
    return Lh, Ll


@jax.jit
def tril_inverse_dd(Lh, Ll):
    """Inverse of a lower-triangular dd matrix, column-solve form.

    X solves L X = I: n sequential steps of vectorized dd ops (forward
    substitution on all RHS columns simultaneously).
    """
    n = Lh.shape[0]
    idx = jnp.arange(n)

    def body(i, state):
        Xh, Xl = state
        # x_i = (e_i - sum_{j<i} L[i,j] x_j) / L[i,i]
        done = (idx < i).astype(Lh.dtype)
        # accumulate s = L[i, :] @ X[:, :] over the solved rows, in
        # FULL dd (elementwise products + pairwise dd reduction — the
        # chunked MXU path would cap the inverse at ~1e-7)
        rowh, rowl = Lh[i] * done, Ll[i] * done
        ph, pl = mul(rowh[:, None], rowl[:, None], Xh, Xl)
        sh, sl = sum_dd(ph, pl, axis=0)
        e = (idx == i).astype(Lh.dtype)
        rh, rl = add(e, jnp.zeros_like(e), -sh, -sl)
        xh, xl = div(rh, rl, Lh[i, i], Ll[i, i])
        keep = idx <= i
        Xh = Xh.at[i, :].set(jnp.where(keep, xh, 0.0))
        Xl = Xl.at[i, :].set(jnp.where(keep, xl, 0.0))
        return Xh, Xl

    z = jnp.zeros_like(Lh)
    Xh, Xl = jax.lax.fori_loop(0, n, body, (z, z))
    return Xh, Xl
