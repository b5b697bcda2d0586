"""Matrix-free TDA: response products with autodiff XC kernels.

TPU-native linear response: the A.x product is assembled from
  * orbital-energy differences (diagonal),
  * the Coulomb response via one Poisson solve of the transition density,
  * the exact-exchange response via the ISDF factorization
    (K_x = aoRg^T (W o aoRg dm_x aoRg^T) aoRg — GEMM cost, any dm_x),
  * the XC kernel as the JVP of the Vxc-matrix function:
        K_xc . x = d/dl Vxc[dm + l dm_x]|_{l=0}
    which jax.jvp evaluates exactly for LDA *and* GGA — no hand-derived
    fxc formulas (the adiabatic kernel is by definition the derivative of
    the validated Vxc).

Solved with a block Davidson iteration — no n_ov^2 matrices are ever
formed, so excited states scale to the same systems the SCF does.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft


def make_tda_matvec(system, scf_res, xc=None, singlet=True, isdf=None,
                    nocc=None):
    """Return (matvec(x (no,nv)) -> (no,nv), diag (no,nv)) for the TDA A."""
    mo_e = np.asarray(scf_res["mo_energy"])
    mo_c = jnp.asarray(scf_res["mo_coeff"])
    if nocc is None:
        nocc = system.nelec // 2
    nmo = mo_c.shape[1]
    nvir = nmo - nocc

    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    fac = 2.0 if singlet else 0.0

    aoR = system.aoR
    Co = mo_c[:, :nocc]
    Cv = mo_c[:, nocc:]
    moR_o = aoR @ Co
    moR_v = aoR @ Cv
    coulG = jnp.asarray(system.coulG)
    mesh, w = system.mesh, system.weight
    dm0 = jnp.asarray(scf_res["dm"], aoR.dtype)

    e_o, e_v = mo_e[:nocc], mo_e[nocc:]
    diag = (e_v[None, :] - e_o[:, None])

    ao_grad = None
    if xcspec is not None and xcspec.family == "gga":
        ao_grad = ao_gradient_fft(aoR, mesh, jnp.asarray(system.Gv, aoR.dtype))

    def vxc_mat_s(dm_s):
        """Closed-shell Vxc as a function of the (symmetric) total dm."""
        from pyscf_isdf_tpu.scf.hf import _vxc_lda, _vxc_gga

        if xcspec.family == "lda":
            _, vmat, _ = _vxc_lda(aoR, dm_s, w, xcspec, mesh)
        else:
            _, vmat, _ = _vxc_gga(aoR, ao_grad, dm_s, w, xcspec, mesh)
        return vmat

    def vxc_mat_spin(dm_a, dm_b):
        """Alpha-channel Vxc of the spin-resolved functional, jnp-pure
        (differentiable for the triplet-kernel jvp)."""
        ta = aoR @ dm_a
        tb = aoR @ dm_b
        rho_a = jnp.maximum(jnp.sum(ta * aoR, axis=-1), 1e-12)
        rho_b = jnp.maximum(jnp.sum(tb * aoR, axis=-1), 1e-12)
        if xcspec.family == "lda":
            _, (va, _vb), _ = xcspec.exc_vxc_spin(rho_a, rho_b)
            return w * ((aoR.T * va) @ aoR)
        ga = 2.0 * jnp.einsum("gi,xgi->xg", ta, ao_grad)
        gb = 2.0 * jnp.einsum("gi,xgi->xg", tb, ao_grad)
        s_aa = jnp.sum(ga * ga, axis=0)
        s_ab = jnp.sum(ga * gb, axis=0)
        s_bb = jnp.sum(gb * gb, axis=0)
        _, (va, _vb), (vsaa, vsab, _vsbb) = xcspec.exc_vxc_spin(
            rho_a, rho_b, s_aa, s_ab, s_bb)
        aow = 0.5 * va[:, None] * aoR + jnp.einsum(
            "xg,xgi->gi", 2.0 * vsaa[None, :] * ga + vsab[None, :] * gb,
            ao_grad)
        half = w * (aoR.T @ aow)
        return half + half.T

    @jax.jit
    def _matvec(x):
        # transition density matrix in the AO basis
        dmx = Co @ x @ Cv.T                                # (nao, nao)
        out = diag * x

        if fac != 0.0:
            rho_x = jnp.sum((moR_o @ x) * moR_v, axis=1)   # (ng,)
            cd = jnp.complex128 if rho_x.dtype == jnp.float64 else jnp.complex64
            vG = coulG * fftdf.fft3(rho_x.astype(cd), mesh)
            vR = fftdf.ifft3(vG, mesh).real.astype(aoR.dtype)
            out = out + fac * w * (moR_o.T * vR) @ moR_v

        if hyb > 0:
            if isdf is not None:
                M = isdf.aoRg @ dmx @ isdf.aoRg.T
                Kx = isdf.aoRg.T @ (isdf.W * M) @ isdf.aoRg
            else:
                Kx = fftdf.get_k(aoR, dmx, coulG, mesh, w)
            out = out - hyb * (Co.T @ Kx @ Cv)

        if xcspec is not None:
            dsym = 0.5 * (dmx + dmx.T)
            if singlet:
                _, kx = jax.jvp(vxc_mat_s, (dm0,), (2.0 * dsym,))
            else:
                half = 0.5 * dm0
                _, kx = jax.jvp(lambda a, b: vxc_mat_spin(a, b),
                                (half, half), (dsym, -dsym))
            out = out + Co.T @ jnp.asarray(kx) @ Cv
        return out

    return _matvec, np.asarray(diag)


def davidson(matvec, diag, nstates=3, tol=1e-8, max_space=60, max_iter=100):
    """Block Davidson for the lowest eigenpairs of a symmetric operator.

    Args:
        matvec: x (shape of diag) -> A.x.
        diag: diagonal preconditioner of A.
    Returns (eigenvalues (nstates,), eigenvectors (n, nstates)).
    """
    shape = diag.shape
    n = diag.size
    dflat = diag.ravel()

    # track a buffer of extra roots so degenerate partners are not missed
    nroots = min(n, max(2 * nstates, nstates + 4))
    order = np.argsort(dflat)
    V = np.zeros((n, nroots))
    for i in range(nroots):
        V[order[i], i] = 1.0

    AV = np.zeros((n, 0))
    Vb = np.zeros((n, 0))
    theta = np.zeros(nstates)
    def _orthonormal_extension(Vb_, Vcand, drop=1e-6):
        """Column-wise MGS with re-orthogonalization: blocked QR amplifies
        roundoff overlaps by 1/r_ii for nearly dependent corrections and
        corrupts the subspace (spurious zero Ritz values)."""
        cols = []
        for v in Vcand.T:
            n0 = np.linalg.norm(v)
            if n0 < 1e-300:
                continue
            v = v / n0
            for _ in range(2):
                if Vb_.shape[1]:
                    v = v - Vb_ @ (Vb_.T @ v)
                for c in cols:
                    v = v - c * (c @ v)
            n1 = np.linalg.norm(v)
            if n1 > drop:
                cols.append(v / n1)
        return (np.stack(cols, axis=1) if cols
                else np.zeros((Vcand.shape[0], 0)))

    for it in range(max_iter):
        Vnew = _orthonormal_extension(Vb, V)
        if Vnew.shape[1] == 0:
            break
        AVnew = np.column_stack([
            np.asarray(matvec(jnp.asarray(v.reshape(shape)))).ravel()
            for v in Vnew.T
        ])
        Vb = np.column_stack([Vb, Vnew])
        AV = np.column_stack([AV, AVnew])
        H = Vb.T @ AV
        H = 0.5 * (H + H.T)
        theta, s = np.linalg.eigh(H)
        theta, s = theta[:nroots], s[:, :nroots]
        X = Vb @ s
        R = AV @ s - X * theta[None, :]
        rnorm = np.linalg.norm(R, axis=0)
        if np.all(rnorm[:nstates] < tol):
            return theta[:nstates], X[:, :nstates]
        # preconditioned residual corrections
        V = np.zeros((n, 0))
        for k in range(nroots):
            if rnorm[k] < tol:
                continue
            denom = dflat - theta[k]
            denom = np.where(np.abs(denom) < 1e-6, 1e-6, denom)
            V = np.column_stack([V, (R[:, k] / denom)])
        if Vb.shape[1] > max_space:
            # restart from current Ritz vectors
            Vb = np.zeros((n, 0))
            AV = np.zeros((n, 0))
            V = np.column_stack([X, V])
    return theta[:nstates], (Vb @ s)[:, :nstates]


def tda_davidson(system, scf_res, xc=None, nstates=3, singlet=True,
                 isdf=None, tol=1e-7):
    """Iterative (matrix-free) TDA excitation energies."""
    matvec, diag = make_tda_matvec(system, scf_res, xc=xc, singlet=singlet,
                                   isdf=isdf)
    return davidson(matvec, diag, nstates=nstates, tol=tol)
