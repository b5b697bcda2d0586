"""Fully-jitted single-chip SCF driver (deployment mode).

The host-orchestrated :func:`pyscf_isdf_tpu.scf.hf.scf_kernel` dispatches a
few device calls per cycle — fine for workstations, but on a remote TPU
every dispatch pays link latency. This driver compiles the WHOLE SCF loop
(fixed iteration count, Fock-damped, `lax.fori_loop`) into one XLA
program: J via the FFT Poisson solve, K via ISDF GEMMs, LDA XC, eigensolve
and density rebuild all on device.

Converges like simple-mixing SCF (no DIIS inside jit yet); intended for
production runs after a warm start, and as the benchmark shape.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod
from pyscf_isdf_tpu.ops.xc import XCSpec


def make_jit_scf(system, xc="lda,vwn", hyb_df=None, n_iter: int = 30,
                 mixing: float = 0.3):
    """Build ``run(dm0) -> (dm, e_elec)`` compiled as one program.

    Args:
        hyb_df: a built ISDF factorization when the functional is hybrid/HF.
        mixing: linear density mixing factor (new = m*new + (1-m)*old).
    """
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    aoR = system.aoR
    dtype = aoR.dtype
    mesh = system.mesh
    w = system.weight
    coulG = jnp.asarray(system.coulG, dtype)
    hcore = jnp.asarray(system.hcore, dtype)
    X = jnp.asarray(system.X, dtype)
    S = jnp.asarray(system.S, dtype)
    mad = jnp.asarray(system.madelung, dtype)
    nocc = system.nelec // 2

    if hyb > 0 and hyb_df is None:
        raise ValueError("hybrid jit SCF needs a built ISDF (hyb_df)")

    ao_grad = None
    if xcspec is not None and xcspec.family == "gga":
        from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft

        ao_grad = ao_gradient_fft(aoR, mesh, jnp.asarray(system.Gv, dtype))

    @jax.jit
    def run(dm0):
        def body(i, carry):
            dm, _ = carry
            vj = fftdf.get_j(aoR, dm, coulG, mesh, w)
            veff = vj
            e_xc = jnp.zeros((), dtype)
            if xcspec is not None and xcspec.family == "lda":
                rho = jnp.maximum(fftdf.get_rho(aoR, dm), 1e-30)
                exc, vrho, _ = xcspec.exc_vxc(rho)
                e_xc = w * jnp.sum(rho * exc)
                veff = veff + w * ((aoR.T * vrho) @ aoR)
            elif xcspec is not None:
                from pyscf_isdf_tpu.scf.hf import _vxc_gga

                e_xc, vxc, _ = _vxc_gga(aoR, ao_grad, dm, w, xcspec, mesh)
                veff = veff + vxc
            e_k = jnp.zeros((), dtype)
            if hyb > 0:
                vk = isdf_mod.get_k(hyb_df, dm) + mad * (S @ dm @ S)
                veff = veff - 0.5 * hyb * vk
                e_k = -0.25 * hyb * jnp.einsum("ij,ji->", dm, vk)
            F = hcore + veff
            e, u = jnp.linalg.eigh(X.T @ F @ X)
            C = X @ u
            dm_new = 2.0 * C[:, :nocc] @ C[:, :nocc].T
            dm_mixed = mixing * dm_new + (1 - mixing) * dm
            e_elec = (jnp.einsum("ij,ji->", dm, hcore)
                      + 0.5 * jnp.einsum("ij,ji->", dm, vj) + e_xc + e_k)
            return dm_mixed, e_elec

        return jax.lax.fori_loop(0, n_iter, body, (dm0, jnp.zeros((), dtype)))

    return run


def run_scf_jit(system, xc="lda,vwn", n_iter: int = 30, isdf_c: float = 8.0,
                mixing: float = 0.3, dm0=None):
    """Convenience wrapper: build (ISDF if hybrid), run, return e_tot."""
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    hyb_df = None
    if hyb > 0:
        hyb_df = isdf_mod.build_isdf(system.aoR, jnp.asarray(system.coulG,
                                                             system.aoR.dtype),
                                     system.mesh, system.weight, c=isdf_c)
    run = make_jit_scf(system, xc=xc, hyb_df=hyb_df, n_iter=n_iter,
                       mixing=mixing)
    if dm0 is None:
        dm0 = jnp.asarray(2.0 / system.aoR.shape[1]
                          * np.eye(system.aoR.shape[1]), system.aoR.dtype)
    dm, e_elec = run(jnp.asarray(dm0, system.aoR.dtype))
    return float(e_elec) + system.e_nuc, np.asarray(dm)
