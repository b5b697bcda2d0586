"""ISDF: interpolative separable density fitting J/K engine (device JAX).

The framework's north-star component. Factorizes AO pair densities

    phi_mu(r) phi_nu(r) ~= sum_P xi_P(r) phi_mu(r_P) phi_nu(r_P)

over n_IP = c * nao interpolation points, turning the per-SCF-iteration
exchange build from O(nao * ngrids) FFTs (pyscf/pbc/df/fft_jk.py:276-291 in
the reference) into three n_IP-sized MXU GEMMs:

    M = aoRg D aoRg^T;   K = aoRg^T (W o M) aoRg

with the Coulomb-kernel matrix W built ONCE per geometry from batched FFTs
of the interpolation vectors (spec per Lu-Ying ISDF; Hu-Lin-Yang
arXiv:1707.09141; BASELINE.json north_star).

Build steps (all device-side):
  1. IP selection: pivoted-Cholesky on (aoR aoR^T)^{o2}
     (ops/interp_points.py) or CVT.
  2. Interpolation vectors: xi = C2 C1^{-1} with C1 = (aoRg aoRg^T)^{o2},
     C2 = (aoR aoRg^T)^{o2}  (Cholesky solve of the n_IP x n_IP Gram).
  3. W_PQ = w * sum_g xi_P(g) ifft(coulG * fft(xi_Q))(g), w = vol/ngrids.

J can also run through W (rho_P = diag(aoRg D aoRg^T), vj = aoRg^T
diag(W rho) aoRg) but the FFT J is exact and O(N log N), so ISDF-J is
optional.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.ops.interp_points import (
    pivoted_cholesky_points, pivoted_cholesky_points_blocked, cvt_points,
    atomic_points,
)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ISDF:
    """Built ISDF factorization (device arrays; a JAX pytree)."""

    aoRg: jnp.ndarray      # (n_ip, nao) AO values at interpolation points
    W: jnp.ndarray         # (n_ip, n_ip) Coulomb kernel between xi vectors
    ip_idx: jnp.ndarray    # (n_ip,) grid indices
    Vxi: jnp.ndarray | None = None   # (n_ip, ng) Coulomb-transformed xi
    # (kept when built with keep_v=True; enables the robust-fit K whose
    # error is QUADRATIC in the fit residual — the fork's robust-fit mode)

    def tree_flatten(self):
        return (self.aoRg, self.W, self.ip_idx, self.Vxi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_ip(self) -> int:
        return self.aoRg.shape[0]


@jax.jit
def _solve_xi(aoR, aoRg):
    """Interpolation vectors xi (nip, ng) solving xi C1 = C2^T.

    Regularized Cholesky solve (C1 is PSD, near-singular for large c).
    dtype-aware regularization: 1e-12 is below f32 resolution and leaves
    the near-singular Gram factorization unstable on TPU; f32 needs the
    shift relative to the LARGEST eigenvalue (~trace), not the mean
    diagonal, to keep Cholesky finite. The solve is applied as two GEMMs
    with the explicit inverse factor: XLA's blocked triangular_solve on
    a grid-sized RHS keeps every per-panel temp alive simultaneously
    (~nip^2 ng / 256 bytes — 19.7 GB at the 3x3x3 bench scale, an HBM
    OOM); inverting the SMALL (nip, nip) factor once and streaming the
    RHS through the MXU is the same solve with O(nip ng) peak memory.
    """
    nip = aoRg.shape[0]
    hi = jax.lax.Precision.HIGHEST   # TPU DEFAULT matmul is bf16
    C1 = jnp.dot(aoRg, aoRg.T, precision=hi) ** 2         # (nip, nip)
    C2 = jnp.dot(aoR, aoRg.T, precision=hi) ** 2          # (ng, nip)
    is_f64 = jnp.finfo(aoR.dtype).bits >= 64
    eps = jnp.asarray(1e-12 if is_f64 else 3e-7, aoR.dtype) \
        * (jnp.trace(C1) / nip if is_f64 else jnp.trace(C1))
    C1r = C1 + eps * jnp.eye(nip, dtype=aoR.dtype)
    L = jnp.linalg.cholesky(C1r)
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(nip, dtype=aoR.dtype), lower=True)
    return jnp.dot(Linv.T, jnp.dot(Linv, C2.T, precision=hi),
                   precision=hi)                             # (nip, ng)


@partial(jax.jit, static_argnames=("grid_chunk", "out_dd"))
def _solve_xi_dd(aoR, aoRg, grid_chunk: int = 4096, out_dd: bool = False):
    """Interpolation vectors via the on-device DOUBLE-FLOAT build.

    The f32 solve is a 30x worse METHOD than the f64 one (BENCH_NOTES
    r3: |dEk| 9.4e-4 vs 3.18e-5 at diamond 2x2x2 c=16) because the
    near-singular squared Gram demands an f32-scale regularization
    shift. This path reproduces the f64 build's conditioning ON DEVICE
    using (hi, lo) double-float arithmetic (ops/dd.py, ~48 significand
    bits), removing the host-staging + translation-symmetry limits of
    tools/certify_sym.py:

      * C1 = (aoRg aoRg^T)^2 in full dd (exact VPU Gram over the short
        nao axis + dd elementwise square) — the conditioning-critical
        matrix, accurate to ~nao * 2^-48;
      * dd Cholesky + dd triangular inverse with an ~1e-11-scale shift
        (vs the f32 path's 3e-7 * trace);
      * the grid-sized RHS C2 = (aoR aoRg^T)^2 and the two solve GEMMs
        on the MXU with chunk-compensated dd accumulation, streamed in
        ``grid_chunk`` column blocks (peak extra memory O(nip *
        grid_chunk) instead of O(nip * ng) dd temporaries).

    Returns xi as f32 — the downstream W assembly and per-iteration K
    GEMMs are f32; what required better-than-f32 precision is the SOLVE
    (condition-amplified), not the storage (benign 2^-24 rounding).
    ``out_dd=True`` instead returns the (hi, lo) pair, for certification
    paths that assemble W at full solve width (tools/certify_dd.py).
    """
    from pyscf_isdf_tpu.ops import dd

    f32 = jnp.float32
    aoR32 = aoR.astype(f32)
    aoRg32 = aoRg.astype(f32)
    nip = aoRg32.shape[0]
    nao = aoRg32.shape[1]
    ng = aoR32.shape[0]

    Gh, Gl = dd.matmul_exact_dd(aoRg32, aoRg32.T)         # (nip, nip)
    C1h, C1l = dd.square_dd(Gh, Gl)
    # Shift scale: must dominate the dd noise floor of C1 (~2^-48 * tr
    # per entry) even when C1 is RANK-DEFICIENT (the oversampled
    # n_ip > pair-rank regime: null-mode pivots land on eps and the
    # solve amplifies C2 noise by 1/eps — measured: eps = 4e-11*tr/nip
    # left 0.09 K error at diamond-primitive c=8 where the f32 build
    # gives 5.8e-5). 1e-10 * tr is ~3000x below the f32 path's 3e-7*tr
    # (whose shift is the 30x method-error culprit) and ~3e4 above the
    # dd noise floor; both regimes measured in tests/test_isdf.py.
    tr = jnp.sum(jnp.diagonal(C1h))
    eps = jnp.asarray(1e-10, f32) * tr
    C1h, C1l = dd.add_f(C1h, C1l, eps * jnp.eye(nip, dtype=f32))
    Lh, Ll = dd.cholesky_dd(C1h, C1l)
    Mh, Ml = dd.tril_inverse_dd(Lh, Ll)                   # L^{-1}
    MhT, MlT = jnp.swapaxes(Mh, 0, 1), jnp.swapaxes(Ml, 0, 1)

    npad = (-ng) % grid_chunk
    aoR_p = jnp.pad(aoR32, ((0, npad), (0, 0)))

    def per_chunk(ar):                                    # (gc, nao)
        Hh, Hl = dd.matmul_f32_dd(ar, aoRg32.T)           # (gc, nip)
        C2h, C2l = dd.square_dd(Hh, Hl)
        Yh, Yl = dd.matmul_dd_dd(Mh, Ml,
                                 jnp.swapaxes(C2h, 0, 1),
                                 jnp.swapaxes(C2l, 0, 1))  # (nip, gc)
        Xh, Xl = dd.matmul_dd_dd(MhT, MlT, Yh, Yl)        # (nip, gc)
        if out_dd:
            return Xh, Xl
        return dd.to_f32(Xh, Xl)

    res = jax.lax.map(per_chunk, aoR_p.reshape(-1, grid_chunk, nao))
    if out_dd:
        def _unchunk(x):
            return jnp.moveaxis(x, 0, 1).reshape(nip, -1)[:, :ng]
        return _unchunk(res[0]), _unchunk(res[1])
    xi = jnp.moveaxis(res, 0, 1).reshape(nip, -1)[:, :ng]
    return xi.astype(aoR.dtype)


@partial(jax.jit, static_argnames=("mesh", "fft_chunk", "keep_v",
                                   "precision"))
def _build_from_idx(aoR, ip_idx, coulG, mesh, weight, fft_chunk: int = 128,
                    keep_v: bool = False, precision: str | None = None):
    """Steps 2+3 of the ISDF build for a given IP set.

    ``coulG`` may be one kernel (ng,) or a stack (nw, ng): the expensive
    IP fit (xi) is shared and one W is built per kernel (the RSH path
    builds the full-range and short-range W from one factorization).
    ``keep_v`` also returns V xi = ifft(coulG fft(xi)) per kernel
    (needed by the robust-fit K). ``precision='dd'`` solves the
    interpolation vectors in on-device double-float (f64-grade
    conditioning on an f32-only TPU; see :func:`_solve_xi_dd`).
    """
    aoRg = aoR[ip_idx]                                    # (nip, nao)
    nip = aoRg.shape[0]
    if precision == "dd":
        xi = _solve_xi_dd(aoR, aoRg)                      # (nip, ng)
    elif precision is None:
        xi = _solve_xi(aoR, aoRg)                         # (nip, ng)
    else:
        raise ValueError(f"unknown build precision {precision!r}")

    # W = w * xi V xi^T with V the Coulomb kernel on the mesh, streamed:
    # each fft_chunk of xi is FFT'd once (shared across kernels) and
    # immediately contracted into W columns — no grid-sized V xi tensor.
    cdtype = jnp.complex128 if aoR.dtype == jnp.float64 else jnp.complex64
    squeeze = coulG.ndim == 1
    coulG_s = coulG[None, :] if squeeze else coulG        # (nw, ng)
    nw = coulG_s.shape[0]
    ng = xi.shape[1]

    npad = (-nip) % fft_chunk
    xi_p = jnp.pad(xi, ((0, npad), (0, 0)))

    def w_cols(block):                                     # (fc, ng)
        fG = fft3(block.astype(cdtype), mesh)
        cols, vs = [], []
        for iw in range(nw):
            v = ifft3(coulG_s[iw][None, :] * fG, mesh).real.astype(aoR.dtype)
            cols.append(xi @ v.T)                          # (nip, fc)
            if keep_v:
                vs.append(v)
        out = jnp.stack(cols)                              # (nw, nip, fc)
        return (out, jnp.stack(vs)) if keep_v else out

    mapped = jax.lax.map(w_cols, xi_p.reshape(-1, fft_chunk, ng))
    Wc = mapped[0] if keep_v else mapped
    W_all = weight * jnp.moveaxis(Wc, 0, 2).reshape(nw, nip, -1)[:, :, :nip]
    W_all = 0.5 * (W_all + jnp.swapaxes(W_all, 1, 2))
    Vxi = None
    if keep_v:
        # (nb, nw, fc, ng) -> (nw, nb*fc, ng) -> trim padding rows
        Vxi = jnp.moveaxis(mapped[1], 0, 1).reshape(nw, -1, ng)[:, :nip]
    if squeeze:
        return aoRg, W_all[0], (Vxi[0] if keep_v else None)
    return aoRg, W_all, Vxi


def build_isdf(aoR, coulG, mesh, weight, n_ip=None, c: float = 8.0,
               method: str = "cholesky", coords=None, rho=None,
               atom_coords=None, keep_v: bool = False,
               precision: str | None = None) -> ISDF:
    """Build the ISDF factorization from gridded AOs.

    Args:
        aoR: (ngrids, nao) real AO values (Gamma).
        coulG: (ngrids,) Coulomb kernel (G=0 -> 0; exxdiv handled post-hoc).
        weight: vol / ngrids.
        n_ip: number of interpolation points (default c * nao).
        method: 'cholesky' (QRCP-equivalent greedy selection), 'cvt'
            (density-weighted K-means; needs coords+rho), or 'atomic'
            (Voronoi-partitioned robust fit; needs coords+atom_coords).
        precision: None (native dtype) or 'dd' (on-device double-float
            interpolation-vector solve — f64-grade build conditioning
            from f32 data; see _solve_xi_dd).
    """
    import numpy as np

    nao = aoR.shape[1]
    if n_ip is None:
        n_ip = int(c * nao)
    n_ip = min(n_ip, aoR.shape[0])
    if method == "cholesky":
        ip_idx, _ = pivoted_cholesky_points(aoR, n_ip)
    elif method == "cholesky-blocked":
        ip_idx, _ = pivoted_cholesky_points_blocked(aoR, n_ip)
    elif method == "cvt":
        if coords is None or rho is None:
            raise ValueError("cvt selection needs coords and rho")
        ip_idx = cvt_points(coords, rho, n_ip)
    elif method == "atomic":
        if coords is None or atom_coords is None:
            raise ValueError("atomic selection needs coords and atom_coords")
        per_atom = max(1, n_ip // len(np.asarray(atom_coords)))
        ip_idx = jnp.asarray(atomic_points(aoR, coords, atom_coords, per_atom))
    else:
        raise ValueError(f"unknown IP selection method {method!r}")
    aoRg, W, Vxi = _build_from_idx(aoR, ip_idx, jnp.asarray(coulG),
                                   tuple(mesh), weight, keep_v=keep_v,
                                   precision=precision)
    return ISDF(aoRg=aoRg, W=W, ip_idx=ip_idx, Vxi=Vxi)


def build_isdf_multi(aoR, coulGs, mesh, weight, n_ip=None, c: float = 8.0,
                     method: str = "cholesky", keep_v: bool = False,
                     precision: str | None = None) -> tuple:
    """One factorization, several Coulomb kernels (e.g. full + SR for RSH).

    Returns a tuple of :class:`ISDF` sharing aoRg/ip_idx, one per kernel
    in ``coulGs`` — the IP selection and interpolation-vector solve are
    done once.
    """
    nao = aoR.shape[1]
    if n_ip is None:
        n_ip = int(c * nao)
    n_ip = min(n_ip, aoR.shape[0])
    if method == "cholesky":
        ip_idx, _ = pivoted_cholesky_points(aoR, n_ip)
    elif method == "cholesky-blocked":
        ip_idx, _ = pivoted_cholesky_points_blocked(aoR, n_ip)
    else:
        raise ValueError(f"unknown IP selection method {method!r}")
    stack = jnp.stack([jnp.asarray(g) for g in coulGs])
    aoRg, W_all, Vxi = _build_from_idx(aoR, ip_idx, stack, tuple(mesh),
                                       weight, keep_v=keep_v,
                                       precision=precision)
    return tuple(ISDF(aoRg=aoRg, W=W_all[i], ip_idx=ip_idx,
                      Vxi=(Vxi[i] if keep_v else None))
                 for i in range(len(coulGs)))


@jax.jit
def get_k(isdf: ISDF, dm):
    """Exchange via 3 GEMMs: K = aoRg^T (W o (aoRg D aoRg^T)) aoRg."""
    M = isdf.aoRg @ dm @ isdf.aoRg.T
    return isdf.aoRg.T @ (isdf.W * M) @ isdf.aoRg


@partial(jax.jit, static_argnames=("use_pallas",))
def get_k_robust(isdf: ISDF, aoR, dm, weight, use_pallas: bool = False):
    """Robust-fit exchange: error QUADRATIC in the ISDF fit residual.

    Standard (interpolative) ISDF replaces BOTH pair densities by their
    fits — the energy error is linear in the residual. The robust form
    (the fork's robust-fit mode; standard robust density fitting)

        (ab|cd) ~= (ab~|cd) + (ab|cd~) - (ab~|cd~)

    keeps one exact pair per term:

        K = T1 + T1^T - K_isdf,
        T1[mu,nu] = w sum_P aoRg[P,mu] sum_g Vxi[P,g] aoR[g,nu] t[g,P],
        t = aoR (aoRg D)^T .

    Cost: two (ng x n_ip x nao) MXU GEMMs per iteration — more than the
    plain 3-GEMM K but still grid-FFT-free; requires build_isdf(...,
    keep_v=True).
    """
    if isdf.Vxi is None:
        raise ValueError("robust K needs build_isdf(..., keep_v=True)")
    B = isdf.aoRg @ dm                       # (nip, nao)
    if use_pallas:
        # fused VMEM-resident cross term (ops/pallas_robust_k): skips
        # the two (ng, n_ip) HBM temporaries of the XLA formulation
        from pyscf_isdf_tpu.ops.pallas_robust_k import robust_k_cross

        C = robust_k_cross(aoR, B, isdf.Vxi)
        T1 = weight * (isdf.aoRg.T @ C)
    else:
        t = aoR @ B.T                        # (ng, nip)
        Z = isdf.Vxi.T * t                   # (ng, nip)
        T1 = weight * (isdf.aoRg.T @ (Z.T @ aoR))
    M = isdf.aoRg @ dm @ isdf.aoRg.T
    K3 = isdf.aoRg.T @ (isdf.W * M) @ isdf.aoRg
    return T1 + T1.T - K3


@jax.jit
def get_j(isdf: ISDF, dm):
    """Coulomb through the ISDF kernel: vj = aoRg^T diag(W rho) aoRg."""
    rho_ip = jnp.einsum("pi,ij,pj->p", isdf.aoRg, dm, isdf.aoRg)
    u = isdf.W @ rho_ip
    return isdf.aoRg.T @ (u[:, None] * isdf.aoRg)


def robust_k_error(isdf: ISDF, aoR, C_w, coulG, mesh, weight):
    """EXACT residual form of the robust-fit exchange-energy error:

        tr(D (K_exact - K_robust)) = w sum_ij (r_ij, V r_ij) >= 0,
        r_ij = rho_ij - rho~_ij

    (the robust fit's error is quadratic: E_rob = 2(rho,V rho~) -
    (rho~,V rho~) per occupied pair, so the deficit telescopes to the
    residual Coulomb norm). Because the estimator is a POSITIVE sum with
    no large-number cancellation, it is float32-safe: evaluating it on
    the TPU at the bench configuration gives the method error that a
    float64 CPU study would report (validated against the f64 dEk table
    of BENCH_NOTES at diamond 2x2x2), at the cost of one occupied-pair
    FFT sweep — which is how BENCH_r03 certifies the 1e-6 Ha bar at the
    3x3x3 scale where an f64 CPU xi solve (2 nip^2 ng ~ 6e15 flops) is
    unreachable.

    Args:
        C_w: (nao, nocc) occupied orbitals scaled by sqrt(occupation).
    Returns float: tr(D K_exact) - tr(D K_robust) for the SAME density
    D = C_w C_w^T.
    """
    psi = aoR @ jnp.asarray(C_w, aoR.dtype)           # (ng, no)
    psig = isdf.aoRg @ jnp.asarray(C_w, aoR.dtype)    # (nip, no)
    cdtype = jnp.complex128 if aoR.dtype == jnp.float64 else jnp.complex64
    mesh = tuple(mesh)
    no = psi.shape[1]
    # the EXPLICIT residual r = rho - xi c is what makes the estimator
    # float32-safe: evaluating (rho,Vrho) - 2(rho,Vrho~) + (rho~,Vrho~)
    # as three separate large terms reintroduces exactly the
    # large-number cancellation the identity exists to avoid (measured:
    # 34x noise inflation at diamond 2x2x2 c=16 in f32). xi is re-solved
    # with the build's own regularized Cholesky (_solve_xi) so the
    # residual is that of the factorization actually in use.
    xi = _solve_xi(aoR, isdf.aoRg)                    # (nip, ng)

    @jax.jit
    def per_i(i):
        rho = (psi * psi[:, i][:, None]).T            # (no, ng)
        c = (psig * psig[:, i][:, None]).T            # (no, nip)
        r = rho - c @ xi                              # explicit residual
        fG = fft3(r.astype(cdtype), mesh)
        Vr = ifft3(coulG[None, :] * fG, mesh).real.astype(rho.dtype)
        return weight * jnp.sum(r * Vr)

    total = 0.0
    for i in range(no):
        total += float(per_i(i))
    return total
