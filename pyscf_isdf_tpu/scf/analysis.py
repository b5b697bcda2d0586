"""Post-SCF analysis utilities: Mulliken populations, dipole, gaps.

Reference analogs: pyscf/scf/hf.py mulliken_pop / dip_moment and the
HOMO/LUMO reporting of the SCF drivers.
"""
from __future__ import annotations

import numpy as np


def mulliken_pop(cell, dm, S):
    """Mulliken AO populations and atomic charges.

    Returns (pop (nao,), charges (natm,)): q_A = Z_A - sum_{mu in A} (D S)_mumu.
    """
    dm = np.asarray(dm)
    if dm.ndim == 3:  # spin-resolved
        dm = dm[0] + dm[1]
    pop = np.einsum("ij,ji->i", dm, S).real
    charges = np.array(cell.charges, dtype=np.float64).copy()
    ao_loc = cell.ao_loc
    for ish, sh in enumerate(cell.shells):
        charges[sh.atom] -= pop[ao_loc[ish]:ao_loc[ish + 1]].sum()
    return pop, charges


def homo_lumo_gap(mo_energy, nocc):
    """(HOMO, LUMO, gap) from sorted orbital energies."""
    e = np.sort(np.asarray(mo_energy).ravel())
    return float(e[nocc - 1]), float(e[nocc]), float(e[nocc] - e[nocc - 1])


def density_of_states(mo_energy_k, weights=None, sigma=0.01, window=None,
                      npts=500):
    """Gaussian-broadened density of states from k-sampled eigenvalues.

    Args:
        mo_energy_k: (nk, nmo) (or flat) orbital energies.
        weights: optional (nk,) k-point weights (default uniform 1/nk).
        sigma: Gaussian broadening (Ha).
        window: (emin, emax); default spans the spectrum +- 5 sigma.
    Returns (energies (npts,), dos (npts,)) with
        integral dos dE = states per cell (x2 for spin-restricted).
    """
    e_k = np.atleast_2d(np.asarray(mo_energy_k, dtype=np.float64))
    nk = e_k.shape[0]
    w = (np.full(nk, 1.0 / nk) if weights is None
         else np.asarray(weights, dtype=np.float64))
    if window is None:
        window = (e_k.min() - 5 * sigma, e_k.max() + 5 * sigma)
    grid = np.linspace(window[0], window[1], npts)
    d = grid[:, None, None] - e_k[None, :, :]
    g = np.exp(-0.5 * (d / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))
    return grid, np.einsum("k,gkm->g", w, g)


# canonical high-symmetry points (fractional, reciprocal basis) per
# lattice family — enough for the common band-structure workflows
_HS_POINTS = {
    "fcc": {"G": (0, 0, 0), "X": (0.5, 0, 0.5), "L": (0.5, 0.5, 0.5),
            "W": (0.5, 0.25, 0.75), "K": (0.375, 0.375, 0.75),
            "U": (0.625, 0.25, 0.625)},
    "bcc": {"G": (0, 0, 0), "H": (0.5, -0.5, 0.5), "N": (0, 0, 0.5),
            "P": (0.25, 0.25, 0.25)},
    "cubic": {"G": (0, 0, 0), "X": (0, 0.5, 0), "M": (0.5, 0.5, 0),
              "R": (0.5, 0.5, 0.5)},
    "hexagonal": {"G": (0, 0, 0), "M": (0.5, 0, 0), "K": (1 / 3, 1 / 3, 0),
                  "A": (0, 0, 0.5), "L": (0.5, 0, 0.5),
                  "H": (1 / 3, 1 / 3, 0.5)},
}


def band_path(cell, path, npoints=50, lattice_type="fcc"):
    """Cartesian k-points along a high-symmetry path, e.g. "LGXWG".

    Returns (kpts (N, 3) in 1/Bohr, xs (N,) cumulative path length for
    plotting, xticks (len(path),) label positions).
    """
    from pyscf_isdf_tpu import lattice as _lat

    pts = _HS_POINTS[lattice_type]
    b = _lat.reciprocal_vectors(cell.a)
    nodes = [np.asarray(pts[c], dtype=np.float64) @ b for c in path]
    kpts, xs, xticks = [], [], [0.0]
    x = 0.0
    for i in range(len(nodes) - 1):
        for t in np.linspace(0.0, 1.0, npoints):
            k = (1 - t) * nodes[i] + t * nodes[i + 1]
            if kpts and np.allclose(k, kpts[-1]):
                continue            # drop duplicated segment joints
            if kpts:
                x += np.linalg.norm(k - kpts[-1])
            kpts.append(k)
            xs.append(x)
        xticks.append(x)            # exact node position
    return np.asarray(kpts), np.asarray(xs), np.asarray(xticks)
