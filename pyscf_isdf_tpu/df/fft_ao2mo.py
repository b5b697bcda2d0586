"""ERIs and integral transforms on the FFT grid (Gamma point, device JAX).

Algorithmic contract per the reference pyscf/pbc/df/fft_ao2mo.py:45-342:
pair densities on the grid, one Poisson solve per pair-block, grid
quadrature for the second pair. Used as the MP2/THC oracle.

    (pq|rs) = w * sum_g V_pq(g) rho_rs(g),
    V_pq = ifft(coulG * fft(rho_pq)),  rho_pq(g) = p(g) q(g)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.fftdf import fft3, ifft3


@partial(jax.jit, static_argnames=("mesh", "chunk"))
def general(moR1, moR2, moR3, moR4, coulG, mesh, weight, chunk: int = 32):
    """MO ERIs (12|34) for four real Gamma-point MO blocks on the grid.

    Args:
        moR1..4: (ng, n1..n4) MO values (moR = aoR @ C).
    Returns (n1*n2, n3*n4) ERI matrix.
    """
    ng = moR1.shape[0]
    n1, n2 = moR1.shape[1], moR2.shape[1]
    n3, n4 = moR3.shape[1], moR4.shape[1]
    cd = jnp.complex128 if moR1.dtype == jnp.float64 else jnp.complex64

    rho34 = (moR3[:, :, None] * moR4[:, None, :]).reshape(ng, n3 * n4)

    pairs12 = (moR1[:, :, None] * moR2[:, None, :]).reshape(ng, n1 * n2).T

    def block(p12):
        vG = coulG[None, :] * fft3(p12.astype(cd), mesh)
        vR = ifft3(vG, mesh).real.astype(p12.dtype)
        return weight * (vR @ rho34)

    npair = n1 * n2
    npad = (-npair) % chunk
    p12 = jnp.pad(pairs12, ((0, npad), (0, 0)))
    out = jax.lax.map(block, p12.reshape(-1, chunk, ng))
    return out.reshape(-1, n3 * n4)[:npair]


def get_eri(aoR, coulG, mesh, weight, chunk: int = 32):
    """AO ERIs (ij|kl) as an (nao^2, nao^2) matrix (Gamma, real)."""
    return general(aoR, aoR, aoR, aoR, coulG, mesh, weight, chunk=chunk)


@partial(jax.jit, static_argnames=("mesh", "chunk"))
def general_kpts(moR_p, moR_q, moR_r, moR_s, coulG_q, expmiqr, mesh, weight,
                 chunk: int = 16):
    """k-point MO ERIs (p ki, q ka | r kj, s kb) with momentum transfer
    q = ka - ki (and kb fixed by conservation).

    Args:
        moR_p..s: (ng, n*) complex Bloch MO values at their k-points.
        coulG_q: (ng,) Coulomb kernel at q (wrap-around applied).
        expmiqr: (ng,) phases e^{-i q.r}.
    Returns (n1*n2, n3*n4) complex ERIs:
        w sum_g ifft(coulG_q fft(conj(p) q e^{-iqr}))(g) conj(r) s e^{+iqr}.
    """
    ng = moR_p.shape[0]
    n1, n2 = moR_p.shape[1], moR_q.shape[1]
    n3, n4 = moR_r.shape[1], moR_s.shape[1]

    rho2 = (moR_r.conj()[:, :, None] * moR_s[:, None, :]).reshape(ng, n3 * n4)
    rho2 = rho2 * expmiqr.conj()[:, None]

    pairs1 = (moR_p.conj()[:, :, None] * moR_q[:, None, :]).reshape(ng, n1 * n2)
    pairs1 = (pairs1 * expmiqr[:, None]).T                       # (n1 n2, ng)

    def block(p1):
        vG = coulG_q[None, :] * fft3(p1, mesh)
        vR = ifft3(vG, mesh)
        return weight * (vR @ rho2)

    npair = n1 * n2
    npad = (-npair) % chunk
    p1 = jnp.pad(pairs1, ((0, npad), (0, 0)))
    out = jax.lax.map(block, p1.reshape(-1, chunk, ng))
    return out.reshape(-1, n3 * n4)[:npair]
