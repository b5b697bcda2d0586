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
