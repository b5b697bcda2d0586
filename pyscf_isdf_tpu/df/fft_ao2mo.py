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


def get_eri_kpts(system, kpts_idx, chunk: int = 16):
    """Public 4-k-point AO ERIs (p k1, q k2 | r k3, s k4).

    The reference's FFTDF.get_eri k-point cases (pyscf/pbc/df/fft_ao2mo.py
    :45-99 — 0000/0011/0110/0123): momentum conservation
    k2 - k1 + k4 - k3 = G is required (ValueError otherwise).

    Args:
        system: a built KSCFSystem (provides aoR_k and kpts).
        kpts_idx: 4 indices into system.kpts.
    Returns (nao^2, nao^2) complex ERI matrix in (12|34) chemist order.
    """
    import numpy as np
    from pyscf_isdf_tpu.ops import coulomb
    from pyscf_isdf_tpu import lattice

    k1, k2, k3, k4 = kpts_idx
    kpts = system.kpts
    cell = system.cell
    q = kpts[k2] - kpts[k1]
    cons = kpts[k4] - kpts[k3] + q
    b = lattice.reciprocal_vectors(cell.a)
    frac = cons @ np.linalg.inv(b)
    if not np.allclose(frac - np.round(frac), 0, atol=1e-8):
        raise ValueError("momentum conservation violated: k2-k1+k4-k3 != G")
    coulG_q = jnp.asarray(coulomb.get_coulG(cell, k=q, exxdiv=None,
                                            kpts=kpts))
    coords = cell.uniform_grid()
    expmiqr = jnp.asarray(np.exp(-1j * coords @ q))
    # a nonzero conserving G-shift (k2-k1+k4-k3 = G) needs no explicit
    # phase: both screened pair densities are exactly periodic and the
    # grid quadrature pairs every Fourier component (incl. the G offset)
    ao = system.aoR_k
    return general_kpts(ao[k1], ao[k2], ao[k3], ao[k4], coulG_q, expmiqr,
                        tuple(system.mesh), system.weight, chunk=chunk)


def ao2mo_7d(system, mo_coeff_kpts, chunk: int = 16):
    """Full k-conserving MO ERI tensor (reference fft_ao2mo.py:342).

    Args:
        mo_coeff_kpts: (nk, nao, nmo) MO coefficients at every k.
    Returns (nk, nk, nk, nmo, nmo, nmo, nmo) complex array out[kp,kq,kr]
    = (p kp, q kq | r kr, s ks) with ks fixed by momentum conservation.
    """
    import numpy as np
    from pyscf_isdf_tpu.kpts_helper import get_kconserv
    from pyscf_isdf_tpu.ops import coulomb

    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    mo = [jnp.asarray(m) for m in mo_coeff_kpts]
    nmo = mo[0].shape[1]
    moR = [system.aoR_k[k] @ mo[k] for k in range(nk)]
    kconserv = get_kconserv(cell.a, kpts)
    coords = cell.uniform_grid()
    mesh = tuple(system.mesh)

    out = np.empty((nk, nk, nk, nmo, nmo, nmo, nmo), dtype=np.complex128)
    for kp in range(nk):
        for kq in range(nk):
            q = kpts[kq] - kpts[kp]
            coulG_q = jnp.asarray(
                coulomb.get_coulG(cell, k=q, exxdiv=None, kpts=kpts))
            expmiqr = jnp.asarray(np.exp(-1j * coords @ q))
            for kr in range(nk):
                ks = kconserv[kp, kq, kr]
                eri = general_kpts(moR[kp], moR[kq], moR[kr], moR[ks],
                                   coulG_q, expmiqr, mesh, system.weight,
                                   chunk=chunk)
                out[kp, kq, kr] = np.asarray(eri).reshape(nmo, nmo, nmo, nmo)
    return out


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
