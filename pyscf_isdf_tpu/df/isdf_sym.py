"""Translation-symmetric supercell ISDF: per-q solves, assembled factorization.

A Gamma-supercell (nrep = N1 x N2 x N3 primitive cells) ISDF whose
interpolation points are one primitive-cell set replicated over the nk
translations block-diagonalizes EXACTLY over momentum transfers q
(df/isdf_q.py). This module assembles the SUPERCELL factorization
(aoRg, W, Vxi of df/isdf.py's ISDF dataclass — the object the robust-K
per-iteration kernel consumes) from the per-q pieces:

    xi_super[(r,P),(s,g)] = (1/nk) sum_q conj(ph[r,q]) ph[s,q] X_q[P,g]
    Vxi_super             =  same with VX_q
    W_super[(r,P),(s,Q)]  = (w/nk) sum_q conj(ph[r,q]) ph[s,q]
                            (X_q VX_{-q}^T)[P,Q]
    ph[r,q] = e^{i q . T_r}

with the per-q Coulomb kernels COSET-SLICED from the supercell kernel
(G_s = (t + nrep*j) b_s per axis, t = q in supercell reciprocal units,
j = primitive fftfreq) so the assembled operator matches the supercell
FFTDF semantics exactly, Nyquist conventions included. The assembled
matrices carry a small antisymmetric imaginary artifact from the
Nyquist shell; real densities only probe the real symmetric part, so
the .real projection is exact for the supercell exchange (validated to
2.7e-15 against FFTDF K in tests/test_isdf_sym.py).

Why this exists (VERDICT r2 next #1): the per-q solves cost
nk * nip_p^2 * ng_p — a factor nk^2 below the dense supercell solve —
so a FLOAT64 build + the exact residual-deficit certification

    tr(D (K_exact - K_robust)) = w sum_pairs (r, V r) >= 0

are feasible on CPU at the diamond 3x3x3 bench scale (where the dense
f64 supercell xi solve is ~1e16 flops). The bench then runs the SAME
factorization (f64-solved, f32-cast) on the TPU: speed and certified
f64 method accuracy of one configuration. As a bonus the f64 solve
removes the f32 Gram-regularization degradation (tools/
validate_residual.py measured the f32-built robust fit 30x worse than
the f64 method at diamond 2x2x2 c=16).

Reference baseline being replaced: pyscf/pbc/df/fft_jk.py:276-291
(exact-K cost model); the supercell/k-point duality is the reference's
own test contract (pyscf/pbc/dft/test/test_gamma_vs_ks.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.isdf import ISDF
from pyscf_isdf_tpu.df import isdf_q as isdf_q_mod


def translations(nrep):
    """(ncells, 3) integer translations, R-major (matching
    models.diamond_supercell / tools.super_cell atom ordering)."""
    return np.stack(np.meshgrid(*[np.arange(n) for n in nrep],
                                indexing="ij"), -1).reshape(-1, 3)


def grid_map(prim_mesh, nrep):
    """(ncells, ng_prim) supercell grid index of every (R, g_prim) point.

    uniform_grid uses fftfreq (wrap-around) ordering, so the map runs
    through signed frequencies: i_s = (pm*R + signed(i_p)) mod (pm*nrep)
    per axis.
    """
    pm = np.asarray(prim_mesh)
    nrep = np.asarray(nrep)
    sm = pm * nrep
    ngp = int(np.prod(pm))
    gi = np.stack(np.unravel_index(np.arange(ngp), tuple(pm)), -1)
    half = (pm - 1) // 2
    j = np.where(gi <= half, gi, gi - pm)
    Rs = translations(nrep)
    out = np.empty((len(Rs), ngp), dtype=np.int64)
    for r, R in enumerate(Rs):
        ii = (pm * R + j) % sm
        out[r] = np.ravel_multi_index(ii.T, tuple(sm))
    return out


def coset_kernels(coulG_super, prim_mesh, nrep, q_list, a_super):
    """(nq, ng_prim) per-q kernel tables sliced from the supercell kernel.

    Supercell G-vector of (q, G_prim): per axis m = t + nrep * j with
    t = q in supercell reciprocal-lattice units and j the primitive
    signed frequency; m wrapped into the supercell fftfreq range. By
    construction the per-q tables then agree with the supercell kernel
    ENTRY-WISE, Nyquist aliasing included.
    """
    pm = np.asarray(prim_mesh)
    nrep = np.asarray(nrep)
    sm = pm * nrep
    ngp = int(np.prod(pm))
    gi = np.stack(np.unravel_index(np.arange(ngp), tuple(pm)), -1)
    half = (pm - 1) // 2
    j = np.where(gi <= half, gi, gi - pm)
    out = np.empty((len(q_list), ngp), dtype=np.float64)
    coulG_super = np.asarray(coulG_super)
    for iq, qv in enumerate(q_list):
        t = np.rint(qv @ np.asarray(a_super).T / (2 * np.pi)).astype(int)
        m = (t[None, :] + nrep * j) % sm          # frequency -> fft index
        out[iq] = coulG_super[np.ravel_multi_index(m.T, tuple(sm))]
    return out


@dataclass
class SymISDF:
    """Host-side (float64) per-q factorization of a symmetric supercell
    build, plus everything needed to assemble/certify it."""

    isdfq: isdf_q_mod.ISDFQ      # per-q factorization (keep_x=True)
    q_list: np.ndarray           # (nq, 3)
    kpts: np.ndarray             # (nk, 3)
    nrep: tuple                  # (3,)
    prim_mesh: tuple             # (3,)
    coulG_q: np.ndarray          # (nq, ng_prim) coset kernel slices
    Mq: np.ndarray               # (nq, nip, nip) w * X_q VX_{-q}^T
    weight: float                # primitive == supercell grid weight


def build_sym(prim_cell, nrep, aoR_k, kpts, coulG_super, c=24.0,
              n_ip=None, method: str = "auto",
              precision: str | None = None,
              dd_eps: float = 1e-11,
              f64_eps: float | None = None, rho=None) -> SymISDF:
    """Per-q build of the translation-symmetric supercell ISDF.

    Args:
        aoR_k: (nk, ng_prim, nao_prim) complex Bloch AOs on the
            primitive grid (k-mesh == nrep, Gamma-centered). complex128
            for the host float64 certification path; complex64 with
            ``precision='dd'`` for the DEVICE-NATIVE build (the per-q
            interpolation solves then run in on-device double-float —
            df/isdf_q._build_q_dd — giving f64-grade conditioning from
            f32 data with no host staging, VERDICT r4 next #1).
        coulG_super: (ng_super,) the SUPERCELL Coulomb kernel the bench /
            SCF uses (exxdiv=None for the ewald-shift convention).
        c: supercell-equivalent compression (n_ip = c * nao_prim points
            per primitive cell = c * nao_super total).
    """
    kpts = np.reshape(np.asarray(kpts), (-1, 3))
    q_list, _ = isdf_q_mod.unique_q(prim_cell, kpts)
    coulG_q = coset_kernels(coulG_super, prim_cell.mesh, nrep, q_list,
                            np.asarray(prim_cell.a) * np.asarray(nrep)[:, None])
    isdfq = isdf_q_mod.build_isdf_q(
        prim_cell, aoR_k, kpts, n_ip=n_ip, c=c, keep_x=True,
        method=method, coulG_q=coulG_q, precision=precision,
        dd_eps=dd_eps, f64_eps=f64_eps, rho=rho)
    # -q class index map
    from pyscf_isdf_tpu import lattice

    binv = np.linalg.inv(lattice.reciprocal_vectors(prim_cell.a))
    nq = len(q_list)
    negq = np.empty(nq, dtype=int)
    for iq in range(nq):
        d = ((-q_list[iq] - q_list) @ binv + 0.5) % 1.0 - 0.5
        negq[iq] = int(np.argmin(np.abs(d).sum(1)))
        if np.abs(d[negq[iq]]).max() > 1e-8:
            raise ValueError("q classes not closed under negation")
    # device einsums (complex D2H is UNIMPLEMENTED on the axon runtime,
    # and the per-q GEMMs belong on the MXU anyway)
    hi = jax.lax.Precision.HIGHEST
    Mq = jnp.stack([jnp.dot(isdfq.Xq[iq], isdfq.VXq[negq[iq]].T,
                            precision=hi)
                    for iq in range(nq)]) * prim_cell.grid_weight
    return SymISDF(isdfq=isdfq, q_list=q_list, kpts=kpts,
                   nrep=tuple(int(n) for n in nrep),
                   prim_mesh=tuple(int(n) for n in prim_cell.mesh),
                   coulG_q=coulG_q, Mq=Mq,
                   weight=float(prim_cell.grid_weight))


def assemble(sym: SymISDF, aoR_super, prim_a, dtype=None) -> ISDF:
    """Assemble the supercell ISDF factorization (device arrays).

    aoRg rows are taken from the caller's own supercell aoR (exact
    consistency with the surrounding SCF/bench pipeline); W and Vxi are
    assembled from the per-q pieces by the translation-group DFT. The
    output feeds isdf.get_k / isdf.get_k_robust / isdf.get_j unchanged.
    """
    return assemble_pieces(sym.nrep, sym.prim_mesh, prim_a, sym.q_list,
                           np.asarray(sym.isdfq.ip_idx),
                           sym.isdfq.VXq, sym.Mq,
                           aoR_super, dtype=dtype)


def assemble_pieces(nrep, prim_mesh, prim_a, q_list, ip_idx, VXq, Mq,
                    aoR_super, dtype=None) -> ISDF:
    """Array-based assembly core (also used by bench.py, which stages
    the f64 per-q pieces in a CPU subprocess — tools/certify_sym.py —
    and assembles/casts them on the TPU)."""
    Rs = translations(nrep)
    Ts = Rs @ np.asarray(prim_a)
    qph = np.exp(1j * Ts @ np.asarray(q_list).T)  # (ncell, nq)
    ns = grid_map(prim_mesh, nrep)                # (ncell, ngp)
    ipg = np.asarray(ip_idx)
    ip_super = ns[:, ipg].reshape(-1)             # (ncell*nip,)

    dtype = dtype or aoR_super.dtype
    rdt = np.float64 if dtype == jnp.float64 else np.float32
    nk = len(Rs)
    nip = len(ipg)
    ngp = ns.shape[1]

    # complex operands are shipped as (real, imag) float pairs and
    # combined on device: the axon TPU runtime supports neither complex
    # device_put nor device-side dtype widening (UNIMPLEMENTED).
    # Already-on-device inputs (the device-native dd sym build) are
    # split on device instead — no host round-trip.
    def _parts(x):
        if isinstance(x, jax.Array):
            return jnp.real(x).astype(rdt), jnp.imag(x).astype(rdt)
        x = np.asarray(x)
        return (jnp.asarray(np.ascontiguousarray(x.real, dtype=rdt)),
                jnp.asarray(np.ascontiguousarray(x.imag, dtype=rdt)))

    qr, qi = _parts(qph)                          # (ncell, nq)

    @jax.jit
    def _w_block(qr, qi, Mr, Mi):
        q = jax.lax.complex(qr, qi)
        M = jax.lax.complex(Mr, Mi)
        W = jnp.einsum("rq,sq,qPQ->rPsQ", q.conj(), q, M,
                       precision=jax.lax.Precision.HIGHEST)
        return (W.real / nk).astype(dtype)

    W = _w_block(qr, qi, *_parts(Mq)).reshape(nk * nip, nk * nip)

    # Vxi_super: assemble per grid-cell block s, scatter into supercell
    # column order (one (ncell*nip, ngp) GEMM-sized einsum per cell)
    Vr, Vi = _parts(VXq)                          # (nq, nip, ngp)
    cols = jnp.asarray(ns.astype(np.int32))       # (ncell, ngp)

    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def _v_update(Vxi, s, cols_s, qr, qi, Vr, Vi):
        # donated Vxi: the column scatter runs in place — without
        # donation each .at[].set copies the full (nk*nip, ngrids)
        # buffer (2x 6.2 GB transient at diamond 3x3x3 gth-dzvp c=20,
        # which OOMed the 16 GB v5e)
        q = jax.lax.complex(qr, qi)
        V = jax.lax.complex(Vr, Vi)
        blk = jnp.einsum("rq,q,qPg->rPg", q.conj(), q[s], V,
                         precision=jax.lax.Precision.HIGHEST)
        blk = (blk.real / nk).astype(dtype)
        return Vxi.at[:, cols_s].set(blk.reshape(nk * nip, ngp))

    Vxi = jnp.zeros((nk * nip, nk * ngp), dtype)
    for s in range(nk):
        # s as a device scalar: ONE trace, dynamic q[s] indexing
        Vxi = _v_update(Vxi, jnp.asarray(s, jnp.int32), cols[s],
                        qr, qi, Vr, Vi)

    ip_j = jnp.asarray(ip_super.astype(np.int32))
    aoRg = jnp.asarray(aoR_super)[ip_j]
    return ISDF(aoRg=aoRg.astype(dtype), W=W, ip_idx=ip_j, Vxi=Vxi)


def certify_deficit(sym: SymISDF, psi_k) -> float:
    """EXACT robust-fit exchange deficit of the assembled supercell
    factorization at the density D = sum_k psi_k psi_k^H / nk-unfolded:

        tr(D (K_exact - K_robust)) = (w/nk) sum_pairs (r, V_q r) >= 0

    evaluated per-q in float64 (feasible at bench scale). psi_k are
    sqrt(occupation)-scaled occupied Bloch orbitals on the primitive
    grid; the returned value is the TOTAL supercell deficit in Hartree
    (deficit_robust's 1/nk is exactly the supercell orbital
    normalization — pinned by the unsaturated-c identity test).
    """
    de = isdf_q_mod.deficit_robust(
        sym.isdfq, psi_k, sym.kpts, sym.coulG_q, sym.prim_mesh,
        sym.weight)
    return float(de)


def certify_deficit_host(sym: SymISDF, psi_k) -> float:
    """FLOAT64 host evaluation of :func:`certify_deficit` for a
    factorization built (and stored) on an f32-only device: pulls the
    per-q pieces to the host through the axon-safe (re, im) split and
    runs the residual identity in numpy complex128 — the shipped
    vectors' method error with no f32 evaluation noise
    (isdf_q.deficit_robust_numpy)."""
    from pyscf_isdf_tpu.utils.misc import host_complex

    if sym.isdfq.Xq is None or sym.isdfq.phase_q is None:
        raise ValueError("host certification needs keep_x=True pieces")
    # FULL-solve-width vectors for dd builds (hi + lo summed in f64):
    # the certificate measures the SOLVED factorization, mirroring the
    # staged-f64 convention; the f32 storage tier's (benign, quadratic)
    # rounding floor is reported separately by the on-device
    # certify_deficit evaluation.
    Xq = host_complex(sym.isdfq.Xq)
    if sym.isdfq.Xq_lo is not None:
        Xq = Xq + host_complex(sym.isdfq.Xq_lo)
    return isdf_q_mod.deficit_robust_numpy(
        Xq, host_complex(sym.isdfq.phase_q),
        sym.isdfq.qmap, np.asarray(sym.isdfq.ip_idx), host_complex(psi_k),
        np.asarray(sym.coulG_q), sym.prim_mesh, sym.weight)
