"""Pulay CDIIS (host-side float64).

Commutator-error DIIS on the Fock matrix, the same extrapolation the
reference SCF driver uses (pyscf/scf/diis.py:40-122 semantics): error
vector e = X^T (F D S - S D F) X in the orthonormal basis, B-matrix solve
with the constraint sum c_i = 1.
"""
from __future__ import annotations

import numpy as np


class DIIS:
    def __init__(self, space: int = 8, min_space: int = 2):
        self.space = space
        self.min_space = min_space
        self._errs: list[np.ndarray] = []
        self._focks: list[np.ndarray] = []

    def update(self, fock: np.ndarray, err: np.ndarray) -> np.ndarray:
        self._focks.append(fock.copy())
        self._errs.append(err.ravel().copy())
        if len(self._focks) > self.space:
            self._focks.pop(0)
            self._errs.pop(0)
        n = len(self._focks)
        if n < self.min_space:
            return fock
        B = np.empty((n + 1, n + 1))
        B[-1, :] = -1.0
        B[:, -1] = -1.0
        B[-1, -1] = 0.0
        for i in range(n):
            for j in range(i, n):
                B[i, j] = B[j, i] = np.vdot(self._errs[i], self._errs[j]).real
        rhs = np.zeros(n + 1)
        rhs[-1] = -1.0
        try:
            c = np.linalg.solve(B, rhs)[:n]
        except np.linalg.LinAlgError:
            c = np.linalg.lstsq(B, rhs, rcond=None)[0][:n]
        return sum(ci * fi for ci, fi in zip(c, self._focks))
