"""DFT+U (rotationally invariant Dudarev scheme) for k-point KS-DFT.

Reference counterpart: pyscf/pbc/dft/krkspu.py — a Hubbard correction on
selected local subspaces,

    E_U = sum_I (U_I/2) [Tr n_I - Tr n_I n_I],
    V_U(k) = sum_I U_I  P_I(k) (1/2 - n_I) P_I(k)^H   (in the S-metric),

with n_I the k-averaged local occupation matrix of subspace I. Projectors
are the cell's own AOs of the chosen (atom, l) shells, Loewdin-
orthonormalized in the overlap metric at each k (the reference's
minao/Loewdin 'reference AO' construction, krkspu.py set_U machinery).

The correction is variational: dE/dU at fixed density equals
(Tr n - Tr n^2)/2 (pinned by a finite-difference test).
"""
from __future__ import annotations

import numpy as np


def _subspace_ao_indices(cell, atom: int, l: int):
    """AO column indices of all (atom, l) shell components."""
    idx = []
    ao_loc = cell.ao_loc
    for ish, sh in enumerate(cell.shells):
        if sh.atom == atom and sh.l == l:
            # take the FIRST contraction of the shell as the projector set
            # (one m-multiplet; additional contractions describe the same
            # angular channel and would double count)
            idx.extend(range(ao_loc[ish], ao_loc[ish] + (2 * l + 1)))
            break
    return idx


def parse_hubbard(cell, specs):
    """Normalize U specs: [(atom_sel, l, U_ha)] with atom_sel an index or
    an element symbol (applies to every matching atom)."""
    out = []
    for sel, l, U in specs:
        if isinstance(sel, str):
            atoms = [ia for ia, s in enumerate(cell.symbols) if s == sel]
        else:
            atoms = [int(sel)]
        for ia in atoms:
            idx = _subspace_ao_indices(cell, ia, l)
            if not idx:
                raise ValueError(f"no l={l} shell on atom {ia}")
            out.append((np.asarray(idx, dtype=np.int64), float(U)))
    return out


class HubbardU:
    """Per-geometry projector data + per-cycle E_U/V_U evaluation."""

    def __init__(self, cell, S_k, specs):
        self.subspaces = parse_hubbard(cell, specs)
        S_k = np.asarray(S_k)
        if S_k.ndim == 2:
            S_k = S_k[None]
        self.nk = S_k.shape[0]
        # Loewdin-orthonormalized projectors per k: C (nao, m) with
        # C^H S C = 1 on the subspace columns
        self.proj = []   # list over subspaces of list over k of SC (nao, m)
        for idx, U in self.subspaces:
            sc_k = []
            for k in range(self.nk):
                C = np.zeros((S_k.shape[1], len(idx)), dtype=S_k.dtype)
                C[idx, np.arange(len(idx))] = 1.0
                M = C.conj().T @ S_k[k] @ C
                w, v = np.linalg.eigh(M)
                Mm12 = (v / np.sqrt(np.maximum(w, 1e-14))) @ v.conj().T
                sc_k.append(S_k[k] @ (C @ Mm12))    # (nao, m): S C_orth
            self.proj.append(sc_k)

    def energy_and_potential(self, dm_k):
        """E_U and V_U(k) for the current density matrices (nk, nao, nao).

        n_I = (1/nk) sum_k P^H D P with P = S C_orth; spin-traced closed
        shell convention (n in [0,2] per orbital -> use n/2 per spin
        channel, E_U = sum_s (U/2)[Tr n_s - Tr n_s^2] with n_s = n/2).
        """
        dm_k = np.asarray(dm_k)
        if dm_k.ndim == 2:
            dm_k = dm_k[None]
        e_u = 0.0
        v_u = np.zeros_like(dm_k)
        for (idx, U), sc_k in zip(self.subspaces, self.proj):
            n = 0
            for k in range(self.nk):
                n = n + sc_k[k].conj().T @ dm_k[k] @ sc_k[k]
            n = n / self.nk
            ns = 0.5 * n                       # per-spin occupation matrix
            e_u += 2 * (U / 2.0) * float(
                (np.trace(ns) - np.trace(ns @ ns)).real)
            dv = U * (0.5 * np.eye(len(idx)) - ns)
            for k in range(self.nk):
                v_u[k] += sc_k[k] @ dv @ sc_k[k].conj().T
        return e_u, v_u
