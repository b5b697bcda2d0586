"""Unfold k-sampled MOs onto the Gamma-point supercell.

Reference analog: pyscf/pbc/tools/k2gamma.py:82-199. A k-sampled orbital
phi_{k,n}(r) = sum_T e^{ik.T} phi_AO(r - T) C_{k,n} maps to a supercell
orbital whose AO coefficients on cell copy R carry the phase e^{ik.T_R}:

    C_sc[(R, mu), (k, n)] = e^{i k.T_R} C_k[mu, n] / sqrt(Nk)

The unfolded set spans the same space as the supercell Gamma calculation;
for real representability the complex pairs are rotated to real
combinations only when degenerate-pair structure allows — here we return
the complex unfolding plus the (real) supercell density matrix, which is
what downstream consumers (SCF restart, analysis) need.
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu import lattice


def get_phase(cell, kpts, nrep):
    """(Ts (ncells,3) lattice translations, phase (ncells, nk) matrix)."""
    nrep = np.asarray(nrep)
    Ts_frac = lattice.cartesian_prod(*[np.arange(n) for n in nrep])
    Ts = Ts_frac @ cell.a
    nk = len(np.reshape(kpts, (-1, 3)))
    phase = np.exp(1j * Ts @ np.reshape(kpts, (-1, 3)).T) / np.sqrt(nk)
    return Ts, phase


def mo_k2gamma(cell, mo_coeff_k, kpts, nrep):
    """Supercell AO coefficients of the unfolded k-MOs.

    Args:
        mo_coeff_k: list of (nao, nmo) per-k MO coefficients.
        nrep: the k-mesh dimensions (supercell replication).

    Returns (ncells*nao, nk*nmo) complex coefficients, columns ordered
    (k, n), AO rows ordered (cell copy, mu) — matching
    :func:`pyscf_isdf_tpu.tools.super_cell` atom ordering.
    """
    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    nao, nmo = mo_coeff_k[0].shape
    Ts, phase = get_phase(cell, kpts, nrep)
    ncells = len(Ts)
    C = np.empty((ncells * nao, nk * nmo), dtype=np.complex128)
    for r in range(ncells):
        for k in range(nk):
            C[r * nao:(r + 1) * nao, k * nmo:(k + 1) * nmo] = (
                phase[r, k] * mo_coeff_k[k]
            )
    return C


def dm_k2gamma(cell, dm_k, kpts, nrep):
    """Supercell Gamma density matrix from per-k density matrices.

    D_sc[(R,mu),(R',nu)] = (1/Nk) sum_k e^{ik.(T_R - T_R')} D_k[mu,nu];
    real for time-reversal-symmetric k-meshes.
    """
    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    dm_k = np.asarray(dm_k)
    nao = dm_k.shape[-1]
    Ts, _ = get_phase(cell, kpts, nrep)
    ncells = len(Ts)
    dT = Ts[:, None, :] - Ts[None, :, :]
    ph = np.exp(1j * dT @ kpts.T)                  # (nc, nc, nk)
    D = np.einsum("rsk,kuv->rusv", ph, dm_k) / nk
    D = D.reshape(ncells * nao, ncells * nao)
    if abs(D.imag).max() < 1e-8:
        D = D.real
    return D
