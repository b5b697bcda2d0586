"""Tiny exact-diagonalization (FCI) oracle over spin orbitals.

Dense full CI in the Slater-determinant basis via the Slater-Condon
rules — the exact correlation oracle the coupled-cluster tests measure
against (no counterpart is importable from the reference tree at test
time; for 2-electron systems CCSD == FCI identically, which pins the
whole CCSD pipeline). Dense build, intended for <= ~16 spin orbitals /
a few thousand determinants.
"""
from __future__ import annotations

from itertools import combinations

import numpy as np


def _phase(det, p):
    """Sign picked up moving an operator past the orbitals of `det`
    below p (det: sorted tuple of occupied spin orbitals)."""
    return -1.0 if sum(1 for q in det if q < p) % 2 else 1.0


def _excitation(deti, detj):
    """Orbitals unique to deti / detj (each sorted)."""
    si, sj = set(deti), set(detj)
    return sorted(si - sj), sorted(sj - si)


def _sign_single(det, p, r):
    """Sign of a_p^+ a_r acting between determinants differing by r->p."""
    # count occupied orbitals strictly between r and p in the common set
    lo, hi = (r, p) if r < p else (p, r)
    n = sum(1 for q in det if lo < q < hi and q != r)
    return -1.0 if n % 2 else 1.0


def build_hamiltonian(h1, eri_asym, dets):
    """Dense H in an arbitrary (same-electron-count) determinant list."""
    ndet = len(dets)
    index = {d: i for i, d in enumerate(dets)}
    nso = h1.shape[0]
    H = np.zeros((ndet, ndet), dtype=np.result_type(h1, eri_asym))

    for I, di in enumerate(dets):
        # diagonal
        e = sum(h1[p, p] for p in di)
        e += 0.5 * sum(eri_asym[p, q, p, q] for p in di for q in di)
        H[I, I] = e
        # singles and doubles
        occ = set(di)
        virt = [a for a in range(nso) if a not in occ]
        for r in di:
            for p in virt:
                dj = tuple(sorted(occ - {r} | {p}))
                J = index.get(dj)
                if J is None or J < I:
                    continue
                sgn = _sign_single(di, p, r)
                val = h1[p, r] + sum(eri_asym[p, q, r, q] for q in di
                                     if q != r)
                H[I, J] = sgn * val
                H[J, I] = np.conj(sgn * val)
        for r, s in combinations(di, 2):
            for p, q in combinations(virt, 2):
                dj = tuple(sorted(occ - {r, s} | {p, q}))
                J = index.get(dj)
                if J is None or J < I:
                    continue
                # <D_J|a_p^+ a_q^+ a_s a_r|D_I>: a_r acts first, so the
                # phases accumulate as remove r, remove s, add q, add p
                d1 = tuple(sorted(occ - {r}))
                d2 = tuple(sorted(occ - {r, s}))
                d3 = tuple(sorted(set(d2) | {q}))
                sgn = (_phase(di, r) * _phase(d1, s)
                       * _phase(d2, q) * _phase(d3, p))
                val = eri_asym[p, q, r, s]
                H[I, J] = sgn * val
                H[J, I] = np.conj(sgn * val)

    return H


def fci_ground_state(h1, eri_asym, nelec, nroots=1, sz_labels=None,
                     target_2sz=None):
    """Lowest eigenvalue(s) of the 2-body Hamiltonian.

    Args:
        h1: (nso, nso) one-body integrals (spin-orbital basis).
        eri_asym: (nso,)*4 antisymmetrized <pq||rs>.
        nelec: electron count.
        sz_labels: optional (nso,) spin label per orbital (0=alpha,
            1=beta). With ``target_2sz`` set, determinants are
            restricted to the n_alpha - n_beta = target_2sz sector —
            the open-shell (UHF-reference) oracle mode, where the
            GLOBAL ground state may live in a different spin sector
            than the state coupled cluster describes.
    Returns (energies, ndet): the nroots lowest electronic energies.
    """
    nso = h1.shape[0]
    dets = list(combinations(range(nso), nelec))
    if target_2sz is not None:
        sz = np.asarray(sz_labels)
        dets = [d for d in dets
                if sum(1 - 2 * int(sz[p]) for p in d) == target_2sz]
    H = build_hamiltonian(h1, eri_asym, dets)
    w = np.linalg.eigvalsh(H)
    return w[:nroots], len(dets)
