"""q-resolved k-point ISDF: per-momentum-transfer interpolation vectors.

This is the translation-symmetric supercell ISDF expressed in momentum
space. Pick ONE set of interpolation points S0 in the primitive cell
(|S0| = c * nao — the same IP density as a Gamma-supercell build with
that c); the supercell factorization over the translated copies of S0
block-diagonalizes EXACTLY over momentum transfers q:

    C1_q[P,P'] = (1/nk) sum_k  R_k[P,P'] conj(R_{k-q}[P,P'])
    C2_q[g,P]  = (1/nk) sum_k  P_k[g,P]  conj(P_{k-q}[g,P])
    X_q        = (C1_q + eps I)^{-1} C2_q^H          (nip, ng)

with R_k / P_k the k-resolved AO pair Grams restricted to S0. A Bloch
pair density conj(phi_k1,mu) phi_k2,nu (momentum q = k2 - k1) is fitted
by the q-sector vectors alone:

    rho~(g) = sum_P X_q[P,g] conj(phi_k1,mu(r_P)) phi_k2,nu(r_P)

The per-q solves cost nk * nip^2 * ng — a factor nk^2 below the dense
supercell solve — which is what makes float64 CPU accuracy studies
feasible at scales where the supercell solve is out of reach (the
BENCH_r03 1e-6 Ha certification at diamond 3x3x3, VERDICT r2 next #1).
Identity tests (supercell symmetric-IP build == this, to ~1e-13 on the
solve and ~1e-6 relative on exchange deficits) live in
tests/test_isdf_q.py.

Compared to the shared-real-xi ISDF-K engine (df/isdf_k.py, Hu-Lin-Yang
arXiv:1707.09141), the q-resolved form is strictly more expressive per
interpolation point: isdf_k needs n_ip ~ c * nk * nao points in the
unit cell (one xi set must serve every (k1,k2) pair class), while here
n_ip ~ c * nao suffices because each momentum sector gets its own
complex vectors. Per-iteration exchange drops from nk^2 (c nk nao)^2 to
nk^2 (c nao)^2 Hadamard/GEMM work.

Reference baseline: the exact k-point exchange these kernels replace is
pyscf/pbc/df/fft_jk.py:50-107 (get_k_kpts; nao * nk^2 grid FFTs per
iteration).

Conventions (validated in the n_ip == ng exact limit):
    K_k1 = (1/nk) sum_k2 A1^H (M2 o conj(W_q)) A1,  M2 = A2 D2 A2^H
    W_q[P,Q] = w sum_g conj(X_q[P,g]) (V_q X_q[Q])(g)
    (V_q f)(g) = e^{iq.r_g} ifft( coulG(q) fft(e^{-iq.r} f) )(g)
with A_k = aoR_k[:, S0] (Bloch values, phases included) and D the
ket-major density matrix dm[k][mu,nu] = sum_i C[mu,i] occ_i conj(C[nu,i]).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.fftdf import fft3, ifft3
from pyscf_isdf_tpu.df.isdf_k import (_select_ips_complex,
                                      _select_ips_complex_blocked)
from pyscf_isdf_tpu.ops import coulomb


def unique_q(cell, kpts):
    """Map (k2, k1) pairs to unique momentum-transfer CLASSES q = k2 - k1
    wrapped into [-1/2, 1/2) fractional coordinates (mod G).

    Wrapping merges representatives differing by a reciprocal-lattice
    vector, so nq == nk on any uniform MP mesh (the unwrapped variant in
    df/isdf_k.py keeps up to (2n-1)^3 duplicates; those are needed there
    because its periodic-part pair phases are tied to the unwrapped
    k2 - k1). Here the fit acts on FULL Bloch pair values, which are
    representative-independent; only phase_q/coulG_q must use the same
    representative, which build_isdf_q guarantees.
    Returns (q_list (nq, 3), qmap (nk, nk) int), first-appearance order.
    """
    from pyscf_isdf_tpu import lattice as _lat

    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    b = _lat.reciprocal_vectors(cell.a)
    diffs = (kpts[:, None, :] - kpts[None, :, :]).reshape(-1, 3)
    frac = diffs @ np.linalg.inv(b)
    frac = ((frac + 0.5) % 1.0) - 0.5
    # snap to exact grid multiples so np.unique bins are stable
    diffs = np.round(frac, 8) @ b
    _, first, inv = np.unique(np.round(diffs, 8), axis=0,
                              return_index=True, return_inverse=True)
    order = np.argsort(first)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    qmap = rank[inv.ravel()].reshape(nk, nk).astype(np.int64)
    return diffs[np.sort(first)], qmap


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ISDFQ:
    """q-resolved k-point ISDF factorization (device arrays; a pytree)."""

    Ag: jnp.ndarray        # (nk, nip, nao) complex Bloch AO values at IPs
    Wq: jnp.ndarray        # (nq, nip, nip) complex per-q kernels
    qmap: np.ndarray       # (nk, nk) -> q index of (k_i - k_j); static
    ip_idx: jnp.ndarray    # (nip,) primitive-grid indices
    Xq: jnp.ndarray | None = None    # (nq, nip, ng) per-q interp vectors
    VXq: jnp.ndarray | None = None   # (nq, nip, ng) V_q-applied Xq rows
    phase_q: jnp.ndarray | None = None  # (nq, ng) e^{-i q.r} (with Xq/VXq)
    Xq_lo: jnp.ndarray | None = None    # dd builds: the low word of Xq
    # (Xq + Xq_lo is the FULL-solve-width factorization; the f64
    # certificate evaluates that object, mirroring the staged-f64
    # convention where the certificate measures the solved
    # factorization and the f32 cast is the benign storage tier)

    def tree_flatten(self):
        return (self.Ag, self.Wq, self.ip_idx, self.Xq, self.VXq,
                self.phase_q, self.Xq_lo), (self.qmap.tobytes(),
                                            self.qmap.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        Ag, Wq, ip_idx, Xq, VXq, phase_q, Xq_lo = children
        qb, qshape = aux
        qmap = np.frombuffer(qb, dtype=np.int64).reshape(qshape)
        return cls(Ag=Ag, Wq=Wq, qmap=qmap, ip_idx=ip_idx, Xq=Xq, VXq=VXq,
                   phase_q=phase_q, Xq_lo=Xq_lo)

    @property
    def n_ip(self) -> int:
        return self.Ag.shape[1]


@partial(jax.jit, static_argnames=("mesh", "fft_chunk", "eps_scale"))
def _build_q(A_k, Ag, ksub_q, coulG_q, phase_q, mesh, weight,
             fft_chunk: int = 64, eps_scale: float | None = None):
    """One momentum sector: (C1_q, C2_q) -> X_q, V_q X_q, W_q.

    Args:
        A_k: (nk, ng, nao) Bloch AOs; Ag: (nk, nip, nao) their IP rows.
        ksub_q: (nk,) index of k - q per k.
        phase_q: (ng,) e^{-i q.r}.
    """
    nk, ng, nao = A_k.shape
    nip = Ag.shape[1]
    hi = jax.lax.Precision.HIGHEST
    R = jnp.einsum("kpa,kqa->kpq", Ag.conj(), Ag,
                   precision=hi)                              # (nk, nip, nip)
    P = jnp.einsum("kga,kpa->kgp", A_k.conj(), Ag,
                   precision=hi)                              # (nk, ng, nip)
    Rm = R[ksub_q]
    Pm = P[ksub_q]
    C1 = jnp.einsum("kpq,kpq->pq", R, Rm.conj(),
                    precision=hi) / nk                        # (nip, nip)
    C2 = jnp.einsum("kgp,kgp->gp", P, Pm.conj(),
                    precision=hi) / nk                        # (ng, nip)
    # Regularization matched to the supercell build (isdf._solve_xi):
    # the q-sector Grams average to the supercell mean diagonal, so the
    # same dtype-aware shift keeps the factorizations interchangeable.
    is_f64 = jnp.finfo(C1.real.dtype).bits >= 64
    diag_mean = jnp.real(jnp.trace(C1)) / nip
    if eps_scale is not None:       # explicit override (accuracy studies)
        eps = jnp.asarray(eps_scale, C1.real.dtype) * jnp.real(jnp.trace(C1))
    else:
        eps = jnp.asarray(1e-12 if is_f64 else 3e-7, C1.real.dtype) \
            * (diag_mean if is_f64 else jnp.real(jnp.trace(C1)))
    cho = jax.scipy.linalg.cho_factor(
        C1 + eps * jnp.eye(nip, dtype=C1.dtype))
    Xq = jax.scipy.linalg.cho_solve(cho, C2.conj().T)      # (nip, ng)
    return _vx_wq(Xq, coulG_q, phase_q, mesh, weight, fft_chunk)


@partial(jax.jit, static_argnames=("mesh", "fft_chunk"))
def _vx_wq(Xq, coulG_q, phase_q, mesh, weight, fft_chunk: int = 64):
    """V_q applied to each X_q row (streamed) + the W_q kernel."""
    nip, ng = Xq.shape
    npad = (-nip) % fft_chunk
    Xp = jnp.pad(Xq, ((0, npad), (0, 0)))

    def v_of(block):                                       # (fc, ng)
        per = phase_q[None, :] * block
        v = ifft3(coulG_q[None, :] * fft3(per, mesh), mesh)
        return phase_q.conj()[None, :] * v

    VX = jax.lax.map(v_of, Xp.reshape(-1, fft_chunk, ng)).reshape(-1, ng)
    VX = VX[:nip]
    # W errors are LINEAR in the exchange energy; this is build-time
    # (never per-iteration), so pin the f32-exact contraction
    Wq = weight * jnp.dot(Xq.conj(), VX.T,
                          precision=jax.lax.Precision.HIGHEST)
    Wq = 0.5 * (Wq + Wq.conj().T)
    return Xq, VX, Wq


@partial(jax.jit, static_argnames=("mesh", "fft_chunk", "grid_chunk",
                                   "eps_scale", "n_refine"))
def _build_q_dd(A_k, Ag, ksub_q, coulG_q, phase_q, mesh, weight,
                fft_chunk: int = 64, grid_chunk: int = 2048,
                eps_scale: float = 1e-10, n_refine: int = 2):
    """One momentum sector solved in on-device DOUBLE-FLOAT precision.

    The per-q interpolation solve inherits the Gamma build's
    conditioning pathology (isdf._solve_xi_dd: the f32-scale
    regularization shift on the near-singular Gram is a 30x worse
    METHOD than the f64 solve), with one new wrinkle: C1_q is COMPLEX
    Hermitian PSD. The dd factorization kernels (ops/dd.py) are real,
    so the solve runs on the real symmetric PSD embedding

        E = [[Re C1, -Im C1], [Im C1, Re C1]]   (2 nip x 2 nip)

    whose Cholesky/solve reproduce the complex solve exactly
    (E [Re x; Im x] = [Re b; Im b]  <=>  C1 x = b; E is PSD with the
    eigenvalues of C1 doubled). Accuracy tiers mirror the Gamma path:

      * per-k Grams R_k = conj(Ag_k Ag_k^H) exactly in complex dd
        (short nao contraction, dd.gram_cdd), the Hadamard
        k-accumulation C1_q = (1/nk) sum_k R_k o conj(R_{k-q}) in
        full dd — the conditioning-critical matrix;
      * dd Cholesky + dd triangular inverse of E (default shift
        1e-11 * tr — smaller than the Gamma dd build's 1e-10 because
        the refinement below suppresses the noise amplification that
        forced the larger shift);
      * the grid-sided C2_q from f32-HIGHEST pair Grams whose
        elementwise Hadamard products are EXACT two_prods, dd-summed
        over k; the two solve GEMMs in dd, streamed in ``grid_chunk``
        column blocks.

    Returns (Xq, VXq, Wq) in the caller's complex dtype (the W
    assembly is storage-tier, like the Gamma build's f32 xi output).
    """
    from pyscf_isdf_tpu.ops import dd

    f32 = jnp.float32
    nk, ng, nao = A_k.shape
    nip = Ag.shape[1]
    Agr = jnp.real(Ag).astype(f32)                        # (nk, nip, nao)
    Agi = jnp.imag(Ag).astype(f32)

    # R_k = conj(Ag_k @ Ag_k^H) == einsum("pa,qa->pq", conj(Ag_k), Ag_k)
    def r_of(parts):
        ar, ai = parts
        grh, grl, gih, gil = dd.gram_cdd(ar, ai)
        return grh, grl, -gih, -gil                       # conjugate

    Rrh, Rrl, Rih, Ril = jax.lax.map(r_of, (Agr, Agi))    # (nk, nip, nip)
    Rmrh, Rmrl = Rrh[ksub_q], Rrl[ksub_q]
    Rmih, Rmil = Rih[ksub_q], Ril[ksub_q]
    # z_k = R_k o conj(Rm_k):  Re = Rr Rmr + Ri Rmi,  Im = Ri Rmr - Rr Rmi
    zrh, zrl = dd.add(*dd.mul(Rrh, Rrl, Rmrh, Rmrl),
                      *dd.mul(Rih, Ril, Rmih, Rmil))
    zih, zil = dd.sub(*dd.mul(Rih, Ril, Rmrh, Rmrl),
                      *dd.mul(Rrh, Rrl, Rmih, Rmil))
    C1rh, C1rl = dd.sum_dd(zrh, zrl, axis=0)
    C1ih, C1il = dd.sum_dd(zih, zil, axis=0)
    inv_nk = jnp.asarray(1.0 / nk, f32)
    C1rh, C1rl = dd.mul_f(C1rh, C1rl, inv_nk)
    C1ih, C1il = dd.mul_f(C1ih, C1il, inv_nk)

    # real symmetric PSD embedding + the Gamma dd build's shift scale
    Eh = jnp.concatenate(
        [jnp.concatenate([C1rh, -C1ih], axis=1),
         jnp.concatenate([C1ih, C1rh], axis=1)], axis=0)
    El = jnp.concatenate(
        [jnp.concatenate([C1rl, -C1il], axis=1),
         jnp.concatenate([C1il, C1rl], axis=1)], axis=0)
    tr = jnp.sum(jnp.diagonal(C1rh))
    eps = jnp.asarray(eps_scale, f32) * tr
    Eh, El = dd.add_f(Eh, El, eps * jnp.eye(2 * nip, dtype=f32))
    Lh, Ll = dd.cholesky_dd(Eh, El)
    Mh, Ml = dd.tril_inverse_dd(Lh, Ll)
    MhT, MlT = Mh.T, Ml.T

    Ar = jnp.real(A_k).astype(f32)                        # (nk, ng, nao)
    Ai = jnp.imag(A_k).astype(f32)
    npad = (-ng) % grid_chunk
    Ar_p = jnp.pad(Ar, ((0, 0), (0, npad), (0, 0)))
    Ai_p = jnp.pad(Ai, ((0, 0), (0, npad), (0, 0)))
    nc = Ar_p.shape[1] // grid_chunk
    Ar_c = Ar_p.reshape(nk, nc, grid_chunk, nao).transpose(1, 0, 2, 3)
    Ai_c = Ai_p.reshape(nk, nc, grid_chunk, nao).transpose(1, 0, 2, 3)

    def per_chunk(parts):                                 # (nk, gc, nao) x2
        ar, ai = parts

        # P_k = conj(A_k[gc]) @ Ag_k^T in FULL complex dd (exact
        # elementwise products over the short nao axis). Round 5
        # measured the former f32-HIGHEST tier as the dd build's
        # accuracy floor in the deep-compression regime: P_k's 2^-24
        # per-entry rounding, squared into C2 and amplified by the
        # regularized solve, left the 3x3x3 c=32 deficit at 1.8e-5
        # where the f64 build reaches 6.8e-7 (the Gamma dense build
        # never had this tier — its RHS Gram is dd-accumulated).
        def p_of(args):
            a_r, a_i, g_r, g_i = args                     # (gc|nip, nao)
            rh1, rl1 = dd.matmul_exact_dd(a_r, g_r.T)
            rh2, rl2 = dd.matmul_exact_dd(a_i, g_i.T)
            Prh_, Prl_ = dd.add(rh1, rl1, rh2, rl2)
            ih1, il1 = dd.matmul_exact_dd(a_r, g_i.T)
            ih2, il2 = dd.matmul_exact_dd(a_i, g_r.T)
            Pih_, Pil_ = dd.sub(ih1, il1, ih2, il2)
            return Prh_, Prl_, Pih_, Pil_

        Prh, Prl, Pih, Pil = jax.lax.map(p_of, (ar, ai, Agr, Agi))
        Pmrh, Pmrl = Prh[ksub_q], Prl[ksub_q]
        Pmih, Pmil = Pih[ksub_q], Pil[ksub_q]
        # C2 = (1/nk) sum_k P o conj(Pm), all dd
        crh, crl = dd.add(*dd.mul(Prh, Prl, Pmrh, Pmrl),
                          *dd.mul(Pih, Pil, Pmih, Pmil))
        cih, cil = dd.sub(*dd.mul(Pih, Pil, Pmrh, Pmrl),
                          *dd.mul(Prh, Prl, Pmih, Pmil))
        C2rh, C2rl = dd.sum_dd(crh, crl, axis=0)          # (gc, nip)
        C2ih, C2il = dd.sum_dd(cih, cil, axis=0)
        C2rh, C2rl = dd.mul_f(C2rh, C2rl, inv_nk)
        C2ih, C2il = dd.mul_f(C2ih, C2il, inv_nk)
        # RHS = C2^H -> [Re; -Im] embedding columns, then X = M^T M B
        Bh = jnp.concatenate([C2rh.T, -C2ih.T], axis=0)   # (2nip, gc)
        Bl = jnp.concatenate([C2rl.T, -C2il.T], axis=0)
        Yh, Yl = dd.matmul_dd_dd(Mh, Ml, Bh, Bl)
        Xh, Xl = dd.matmul_dd_dd(MhT, MlT, Yh, Yl)
        # ITERATIVE REFINEMENT on the shifted system (round-5 finding:
        # the raw dd solve's rounding, amplified by cond ~ 1/eps_rel,
        # floors the 3x3x3 c=32 deficit at 1.8e-5 where the f64 solve
        # at the SAME shift reaches 1.3e-6). The RESIDUAL product E X
        # must be FULL-dd exact: R is a small difference of large
        # quantities, and any GEMM rounding u in it is re-amplified by
        # ||E||/eps — the fast chunk-compensated tier's u ~ 1e-7
        # DIVERGES at eps <= 1e-10 (measured 0.34 Ha). So the dominant
        # Eh Xh term uses the exact elementwise path; the cross terms
        # (already 2^-24 small) use HIGHEST GEMMs. Applying the
        # preconditioner to the SMALL residual is benign — fast tier.
        hi_p = jax.lax.Precision.HIGHEST
        for _ in range(n_refine):
            AXh, AXl = dd.matmul_exact_dd(Eh, Xh)
            cross = jnp.dot(Eh, Xl, precision=hi_p) \
                + jnp.dot(El, Xh, precision=hi_p)
            AXh, AXl = dd.add(AXh, AXl, cross, jnp.zeros_like(cross))
            Rh, Rl = dd.sub(Bh, Bl, AXh, AXl)
            Yh, Yl = dd.matmul_dd_dd(Mh, Ml, Rh, Rl)
            dXh, dXl = dd.matmul_dd_dd(MhT, MlT, Yh, Yl)
            Xh, Xl = dd.add(Xh, Xl, dXh, dXl)
        return (Xh[:nip], Xl[:nip], Xh[nip:], Xl[nip:])

    Xrh, Xrl, Xih, Xil = jax.lax.map(per_chunk, (Ar_c, Ai_c))

    def _unchunk(x):                                      # (nc, nip, gc)
        return jnp.moveaxis(x, 0, 1).reshape(nip, -1)[:, :ng]

    # hi/lo words as SEPARATE complex arrays: hi is the f32 storage tier
    # the device kernels ship; hi + lo is the full solve width the f64
    # certificate evaluates (storage rounding is quadratic in the
    # deficit and scales with supercell size — measured 1.8e-5 at
    # diamond 3x3x3 c=32 where the solve itself matches f64's 6.8e-7).
    Xq_hi = jax.lax.complex(_unchunk(Xrh), _unchunk(Xih))
    Xq_lo = jax.lax.complex(_unchunk(Xrl), _unchunk(Xil))
    Xq, VX, Wq = _vx_wq(Xq_hi.astype(A_k.dtype), coulG_q, phase_q, mesh,
                        weight, fft_chunk)
    return Xq, VX, Wq, Xq_lo.astype(A_k.dtype)


def build_isdf_q(cell, aoR_k, kpts, n_ip=None, c: float = 16.0,
                 exxdiv=None, omega: float = 0.0, keep_x: bool = False,
                 method: str = "auto", blk: int = 64,
                 coulG_q=None, precision: str | None = None,
                 dd_eps: float = 1e-11,
                 f64_eps: float | None = None, rho=None) -> ISDFQ:
    """Build the q-resolved k-point ISDF factorization.

    Args:
        aoR_k: (nk, ng, nao) complex Bloch AO values on the primitive
            grid (ops.ao_eval conventions).
        c: IP count as a multiple of nao — the SUPERCELL-equivalent
            compression (n_ip = c * nao points in the primitive cell,
            matching a Gamma-supercell build at the same c).
        exxdiv: None or 'vcut_*' baked into the kernels; 'ewald' is the
            SCF loop's post-hoc madelung shift — pass None for it.
        keep_x: retain Xq/VXq/phase_q (needed by the robust exchange and
            the residual-deficit certifier).
        precision: None (native dtype) or 'dd' — solve each momentum
            sector's interpolation vectors in on-device double-float
            (f64-grade conditioning on an f32-only TPU; the k-point
            counterpart of df/isdf.py precision='dd').
    """
    if precision not in (None, "dd"):
        raise ValueError(f"unknown build precision {precision!r}")
    kpts = np.reshape(np.asarray(kpts), (-1, 3))
    nk, ng, nao = aoR_k.shape
    if n_ip is None:
        n_ip = int(c * nao)
    n_ip = min(n_ip, ng)

    # IP selection on the k-stacked periodic parts (same metric as the
    # shared-xi engine; the factorization is exact-per-index-set, so the
    # selection only affects quality, not the identities)
    coords = np.asarray(cell.uniform_grid())
    rdt = np.float64 if aoR_k.dtype == jnp.complex128 else np.float32
    if n_ip >= ng:
        # exact limit: every grid point is an interpolation point (the
        # identity-test configuration) — skip the pivoted selection,
        # whose Gram is exactly singular past the pair rank
        ip_idx = np.arange(ng)
    else:
        from pyscf_isdf_tpu.utils.misc import device_complex

        phases = device_complex(np.exp(-1j * coords @ kpts.T), aoR_k.dtype)
        U3 = aoR_k * jnp.transpose(phases)[:, :, None]
        U = jnp.transpose(U3, (1, 0, 2)).reshape(ng, nk * nao)
        if method == "auto":
            method = "cholesky-blocked" if n_ip >= 512 else "cholesky"
        if method == "cholesky":
            ip_idx = _select_ips_complex(U, n_ip)
        elif method == "cholesky-blocked":
            ip_idx = _select_ips_complex_blocked(U, n_ip, blk=blk)
        elif method == "cvt":
            # centroidal-Voronoi (density-weighted K-means) selection on
            # the k-averaged density — the Dong-Hu-Lin CVT variant for
            # the per-q build (headroom study, VERDICT r4 next #5)
            from pyscf_isdf_tpu.ops.interp_points import cvt_points

            if rho is None:
                rho = jnp.mean(jnp.sum(jnp.abs(aoR_k) ** 2, axis=2),
                               axis=0)
            ip_idx = cvt_points(jnp.asarray(coords), jnp.asarray(rho),
                                n_ip)
        else:
            raise ValueError(f"unknown IP selection method {method!r}")

    from pyscf_isdf_tpu import lattice

    q_list, qmap = unique_q(cell, kpts)
    nq = len(q_list)
    # ksub[iq, ik] = index m with k_m == k_ik - q_iq (mod G). Differences
    # of MP-mesh points lie on the Gamma-centered difference mesh, so
    # k - q stays on the (possibly shifted) k-mesh for ANY uniform MP
    # mesh — Gamma-centered or not.
    ksub = np.zeros((nq, nk), dtype=np.int64)
    binv = np.linalg.inv(lattice.reciprocal_vectors(cell.a))
    kf = kpts @ binv
    for iq in range(nq):
        tgt = kf - q_list[iq] @ binv                       # (nk, 3) frac
        dd = ((tgt[:, None, :] - kf[None, :, :] + 0.5) % 1.0) - 0.5
        m = np.argmin(np.abs(dd).sum(-1), axis=1)
        if np.abs(dd[np.arange(nk), m]).max() > 1e-8:
            raise ValueError("k-mesh is not closed under q-translation "
                             "(need a uniform Monkhorst-Pack mesh)")
        ksub[iq] = m

    if coulG_q is None:
        coulG_q = np.stack([
            coulomb.get_coulG(cell, k=q, exxdiv=exxdiv, kpts=kpts,
                              omega=(omega or None))
            for q in q_list
        ]).astype(rdt)
        # q=0: symmetrize over G -> -G. On non-orthogonal lattices the
        # fftfreq Nyquist planes make |G|^2 index-asymmetric (the -n/2
        # frequency is kept, +n/2 aliases onto it); the real Gamma
        # pipeline implicitly symmetrizes by taking .real of ifft, and
        # the k-point J (fftdf_k.get_j_kpts / scf.khf) does the same —
        # this keeps the complex q=0 sector on the identical convention.
        mesh3 = tuple(cell.mesh)
        neg = np.ravel_multi_index(
            np.meshgrid(*[(-np.arange(n)) % n for n in mesh3],
                        indexing="ij"), mesh3).ravel()
        for iq in range(nq):
            if np.abs(q_list[iq]).max() < 1e-9:
                coulG_q[iq] = 0.5 * (coulG_q[iq] + coulG_q[iq][neg])
    else:
        # caller-supplied (nq, ng) kernel table in q_list order (e.g.
        # coset slices of a supercell kernel for the exact supercell
        # correspondence — df/isdf_sym.py)
        coulG_q = np.asarray(coulG_q, dtype=rdt)
        if coulG_q.shape != (nq, ng):
            raise ValueError(f"coulG_q must be ({nq}, {ng}), "
                             f"got {coulG_q.shape}")
    from pyscf_isdf_tpu.utils.misc import device_complex as _dc

    phase_q = _dc(np.exp(-1j * coords @ q_list.T).T.copy(),
                  aoR_k.dtype)                             # (nq, ng)
    Ag = aoR_k[:, np.asarray(ip_idx)]                      # (nk, nip, nao)

    is_dd = precision == "dd"
    if is_dd:
        build_fn = partial(_build_q_dd, eps_scale=dd_eps)
    elif f64_eps is not None:
        build_fn = partial(_build_q, eps_scale=f64_eps)
    else:
        build_fn = _build_q
    Xq_l, VXq_l, Wq_l, Xlo_l = [], [], [], []
    for iq in range(nq):
        out = build_fn(aoR_k, Ag, jnp.asarray(ksub[iq]),
                       jnp.asarray(coulG_q[iq]), phase_q[iq],
                       tuple(cell.mesh), cell.grid_weight)
        Xq, VX, Wq = out[:3]
        Wq_l.append(Wq)
        if keep_x:
            Xq_l.append(Xq)
            VXq_l.append(VX)
            if is_dd:
                Xlo_l.append(out[3])
    return ISDFQ(Ag=Ag, Wq=jnp.stack(Wq_l), qmap=qmap,
                 ip_idx=jnp.asarray(ip_idx),
                 Xq=(jnp.stack(Xq_l) if keep_x else None),
                 VXq=(jnp.stack(VXq_l) if keep_x else None),
                 phase_q=(phase_q if keep_x else None),
                 Xq_lo=(jnp.stack(Xlo_l) if (keep_x and is_dd) else None))


@jax.jit
def _j_kpts_run(isdfq, dm):
    # ISDFQ is a pytree with qmap in its STATIC aux data, so these
    # module-level jits cache across SCF cycles (per-call closures
    # recompiled the whole program every iteration — code review)
    nk = isdfq.Ag.shape[0]
    q0 = int(isdfq.qmap[0, 0])
    rho = jnp.einsum("kpa,kab,kpb->p", isdfq.Ag, dm, isdfq.Ag.conj()) / nk
    u = isdfq.Wq[q0] @ rho
    return jnp.einsum("kpa,p,kpb->kab", isdfq.Ag.conj(), u, isdfq.Ag)


def get_j_kpts(isdfq: ISDFQ, dm_k):
    """Fitted Coulomb: the q=0 sector is a REAL Gamma-type ISDF.

    vj_k = A_k^H diag(W_0 rho_ip) A_k,
    rho_ip[P] = (1/nk) sum_k2 (A2 D2 A2^H)[P,P].
    """
    return _j_kpts_run(isdfq, jnp.asarray(dm_k, isdfq.Ag.dtype))


@partial(jax.jit, static_argnames=("k1_list",))
def _k_kpts_run(isdfq, dm, k1_list):
    Ag, Wq, qmap = isdfq.Ag, isdfq.Wq, isdfq.qmap
    nk = Ag.shape[0]
    M_all = [Ag[k2] @ dm[k2] @ Ag[k2].conj().T for k2 in range(nk)]
    out = []
    for k1 in k1_list:
        acc = jnp.zeros((Ag.shape[2], Ag.shape[2]), Ag.dtype)
        for k2 in range(nk):
            W = Wq[qmap[k2, k1]]
            acc = acc + Ag[k1].conj().T @ (M_all[k2] * W.conj()) @ Ag[k1]
        out.append(acc / nk)
    return jnp.stack(out)


def get_k_kpts(isdfq: ISDFQ, dm_k, k1_idx=None):
    """Fitted exchange: K_k1 = (1/nk) sum_k2 A1^H (M2 o conj(W_q)) A1."""
    nk = isdfq.Ag.shape[0]
    k1_list = tuple(range(nk)) if k1_idx is None else tuple(k1_idx)
    return _k_kpts_run(isdfq, jnp.asarray(dm_k, isdfq.Ag.dtype), k1_list)


def get_k_kpts_robust(isdfq: ISDFQ, dm_k, aoR_k, weight, k1_idx=None):
    """Robust-fit exchange (error quadratic in the fit residual):

        K_rob = T + T^H - K_fit,
        T_k1  = (w/nk) sum_k2 Phi1^H ((t2 o conj(VX_q^T)) A1),
        t2    = Phi2 D2 A2^H

    — one exact pair per term, the k-point analog of isdf.get_k_robust.
    Requires build_isdf_q(..., keep_x=True).
    """
    if isdfq.VXq is None:
        raise ValueError("robust K needs build_isdf_q(..., keep_x=True)")
    nk = isdfq.Ag.shape[0]
    k1_list = tuple(range(nk)) if k1_idx is None else tuple(k1_idx)
    return _k_kpts_robust_run(isdfq, jnp.asarray(dm_k, isdfq.Ag.dtype),
                              aoR_k, weight, k1_list)


@partial(jax.jit, static_argnames=("k1_list",))
def _k_kpts_robust_run(isdfq, dm, aoR, weight, k1_list):
    Ag, Wq, VXq, qmap = isdfq.Ag, isdfq.Wq, isdfq.VXq, isdfq.qmap
    nk = Ag.shape[0]
    nao = Ag.shape[2]
    M_all = [Ag[k2] @ dm[k2] @ Ag[k2].conj().T for k2 in range(nk)]
    t_all = [aoR[k2] @ dm[k2] @ Ag[k2].conj().T for k2 in range(nk)]
    out = []
    for k1 in k1_list:
        T = jnp.zeros((nao, nao), Ag.dtype)
        Kf = jnp.zeros((nao, nao), Ag.dtype)
        for k2 in range(nk):
            iq = qmap[k2, k1]
            Y = t_all[k2] * VXq[iq].conj().T           # (ng, nip)
            T = T + aoR[k1].conj().T @ (Y @ Ag[k1])
            Kf = Kf + Ag[k1].conj().T @ (
                M_all[k2] * Wq[iq].conj()) @ Ag[k1]
        T = weight * T / nk
        out.append(T + T.conj().T - Kf / nk)
    return jnp.stack(out)


def deficit_robust_numpy(Xq, phase_q, qmap, ip_idx, psi_k, coulG_q_full,
                         mesh, weight):
    """Host float64 evaluation of the robust-fit exchange deficit.

    Same identity as :func:`deficit_robust` — tr(D (K_exact - K_rob)) =
    (w/nk) sum_pairs (r, V_q r) — evaluated in numpy complex128. This is
    the FLOAT64 CERTIFICATE of a factorization whose Xq may have been
    built and stored on an f32-only device (the dd build): the deficit
    of the SHIPPED vectors is computed with f64 FFTs and f64 residual
    algebra, so the reported method error carries no f32 evaluation
    noise. Cost: nk^2 nocc^2 primitive-mesh FFTs — minutes on one host
    core at the diamond 3x3x3 bench scale, because every object is
    per-q (this is what makes the no-host-staging bench certification
    feasible, VERDICT r4 next #1).

    Args:
        Xq: (nq, nip, ng) interpolation vectors (any float/complex width;
            upcast to complex128 here).
        phase_q: (nq, ng) e^{-i q.r}.
        qmap: (nk, nk) q index of k_i - k_j.
        psi_k: (nk, ng, nocc) sqrt(occ)-scaled occupied Bloch orbitals.
        coulG_q_full: (nq, ng) per-q Coulomb kernels (exxdiv=None).
    """
    Xq = np.asarray(Xq, dtype=np.complex128)
    phase_q = np.asarray(phase_q, dtype=np.complex128)
    psi_k = np.asarray(psi_k, dtype=np.complex128)
    coulG_q_full = np.asarray(coulG_q_full, dtype=np.float64)
    ipg = np.asarray(ip_idx)
    nk, ng, nocc = psi_k.shape
    mesh = tuple(mesh)
    psig = psi_k[:, ipg, :]
    total = 0.0
    for k1 in range(nk):
        for k2 in range(nk):
            iq = int(qmap[k2, k1])
            p = (psi_k[k1].conj()[:, :, None]
                 * psi_k[k2][:, None, :]).reshape(ng, -1).T
            pg = (psig[k1].conj()[:, :, None]
                  * psig[k2][:, None, :]).reshape(len(ipg), -1).T
            r = p - pg @ Xq[iq]
            per = phase_q[iq][None, :] * r
            vG = np.fft.fftn(per.reshape(-1, *mesh), axes=(1, 2, 3))
            vG *= coulG_q_full[iq].reshape(mesh)[None]
            v = np.fft.ifftn(vG, axes=(1, 2, 3)).reshape(-1, ng)
            vr = phase_q[iq].conj()[None, :] * v
            total += float(np.sum(np.real(np.sum(r.conj() * vr, axis=1))))
    return weight * total / nk


def deficit_robust(isdfq: ISDFQ, psi_k, kpts, coulG_q_full, mesh, weight):
    """EXACT robust-fit exchange-energy error at a k-sampled density:

        tr(D (K_exact - K_rob)) = (w/nk) sum_{k1 i k2 j} (r, V_q r),
        r = conj(psi_k1,i) psi_k2,j  -  X_q^T [pair at IPs]

    a POSITIVE sum with no large-number cancellation (the robust error
    telescopes to the residual Coulomb norm per occupied pair). This is
    the BENCH_r03 certification quantity: the f64 evaluation is feasible
    at the diamond 3x3x3 scale because every object is per-q
    (nk * nip^2 * ng solve; nk^2 nocc^2 small FFTs), where the
    equivalent supercell evaluation is ~nk^2 x more flops.

    Args:
        psi_k: (nk, ng, nocc) sqrt(occupation)-scaled occupied Bloch
            orbitals on the primitive grid.
        coulG_q_full: (nq, ng) per-q Coulomb kernels (exxdiv=None).
    Returns the TOTAL (supercell) deficit in Hartree, and the per-pair
    breakdown's maximum for diagnostics.
    """
    if isdfq.Xq is None:
        raise ValueError("deficit needs build_isdf_q(..., keep_x=True)")
    nk, ng, nocc = psi_k.shape
    qmap = isdfq.qmap
    ipg = np.asarray(isdfq.ip_idx)
    psig = psi_k[:, ipg, :]                                # (nk, nip, nocc)
    mesh = tuple(mesh)

    @jax.jit
    def pair_block(k1_psi, k1_psig, k2_psi, k2_psig, Xq, phq, coulG):
        # all nocc^2 pairs of one (k1, k2) at once
        p = k1_psi.conj()[:, :, None] * k2_psi[:, None, :]   # (ng, no, no)
        pg = k1_psig.conj()[:, :, None] * k2_psig[:, None, :]
        p = p.reshape(ng, -1).T                              # (no^2, ng)
        pg = pg.reshape(len(ipg), -1).T
        r = p - jnp.dot(pg, Xq,
                        precision=jax.lax.Precision.HIGHEST)
        per = phq[None, :] * r
        v = ifft3(coulG[None, :] * fft3(per, mesh), mesh)
        vr = phq.conj()[None, :] * v
        return jnp.sum(jnp.real(jnp.sum(r.conj() * vr, axis=1)))

    total = 0.0
    for k1 in range(nk):
        for k2 in range(nk):
            iq = int(qmap[k2, k1])
            total += float(pair_block(
                psi_k[k1], psig[k1], psi_k[k2], psig[k2],
                isdfq.Xq[iq], isdfq.phase_q[iq],
                jnp.asarray(coulG_q_full[iq])))
    return weight * total / nk
