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
