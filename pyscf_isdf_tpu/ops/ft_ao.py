"""Analytic Fourier transforms of Gaussian AOs (host-side, float64).

For a solid-harmonic Gaussian ``phi(r) = c S_lm(r-A) exp(-a|r-A|^2)`` the
plane-wave matrix element is closed-form:

    FT[phi](G) = int phi(r) e^{-i G.r} dr
               = e^{-i G.A} (-i)^l (2a)^{-l} S_lm(G) (pi/a)^{3/2} e^{-G^2/(4a)}

(derived from S_lm harmonic + Gaussian FT; functional spec per the
reference's C kernel pyscf/lib/pbc/ft_ao.c via pyscf/pbc/df/ft_ao.py:63-102).

Because the periodic AO's Fourier-series coefficients are exactly these
analytic FTs (Poisson summation), overlap and kinetic matrices follow from
G-space quadrature with errors ~ exp(-Gmax^2/(4 a_min)) — machine-negligible
for any converged mesh:

    S_uv = (1/vol) sum_G  conj(ft_u(k+G)) ft_v(k+G)
    T_uv = (1/vol) sum_G  |k+G|^2/2 conj(ft_u(k+G)) ft_v(k+G)

This replaces the reference's libcint lattice-sum ``pbc_intor`` for
int1e_ovlp/int1e_kin (pyscf/pbc/scf/hf.py:633-658) with a mesh-native
formulation — no real-space integral library needed.
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics


def ft_ao(cell, Gv: np.ndarray, kpt=None) -> np.ndarray:
    """(ngrids, nao) analytic AO Fourier transforms at G (or k+G) vectors."""
    if kpt is not None:
        Gv = Gv + np.asarray(kpt)[None, :]
    ng = Gv.shape[0]
    G2 = np.einsum("gi,gi->g", Gv, Gv)
    out = np.empty((ng, cell.nao), dtype=np.complex128)
    ao_loc = cell.ao_loc
    for ish, sh in enumerate(cell.shells):
        A = cell.coords[sh.atom]
        phase = np.exp(-1j * Gv @ A)                                   # (ng,)
        ang = solid_harmonics(sh.l, Gv, np)                            # (ng, M)
        # radial part per contraction: (ng, K)
        rad = np.einsum(
            "gp,pk->gk",
            (np.pi / sh.exps[None, :]) ** 1.5
            * (2 * sh.exps[None, :]) ** (-sh.l)
            * np.exp(-G2[:, None] / (4 * sh.exps[None, :])),
            sh.coeffs,
        )
        il = (-1j) ** sh.l
        blk = il * phase[:, None, None] * rad[:, :, None] * ang[:, None, :]
        out[:, ao_loc[ish]:ao_loc[ish + 1]] = blk.reshape(ng, sh.nao)
    return out


def converged_st_mesh(cell) -> tuple:
    """Mesh whose G-truncation error in S/T is below machine precision.

    The FT of a primitive pair decays like exp(-G^2/(4 a_max)); requiring
    exp(-Gmax^2/(4 a_max)) < 1e-16 gives ke = Gmax^2/2 = 74 a_max. This is a
    build-time host-quadrature mesh only — the SCF grid is unaffected.
    """
    from pyscf_isdf_tpu import lattice

    a_max = max(float(sh.exps.max()) for sh in cell.shells)
    mesh = lattice.cutoff_to_mesh(cell.a, 74.0 * a_max)
    return tuple(int(max(m, c)) for m, c in zip(mesh, cell.mesh))


def overlap_and_kinetic(cell, mesh=None, kpt=None):
    """Analytic-FT overlap and kinetic matrices via G-space quadrature.

    The quadrature mesh is chosen independently of the SCF mesh so the
    G-sum is converged to machine precision (matching the reference's
    analytic lattice-sum integrals). Returns (S, T) real float64 at Gamma,
    complex at finite k.
    """
    mesh = mesh or converged_st_mesh(cell)
    Gv = cell.get_Gv(mesh)
    if kpt is not None:
        kG = Gv + np.asarray(kpt)[None, :]
    else:
        kG = Gv
    aoG = ft_ao(cell, Gv, kpt=kpt)
    kG2 = np.einsum("gi,gi->g", kG, kG)
    s = aoG.conj().T @ aoG / cell.vol
    t = (aoG.conj() * (0.5 * kG2)[:, None]).T @ aoG / cell.vol
    if kpt is None or np.allclose(kpt, 0):
        return s.real, t.real
    return s, t
