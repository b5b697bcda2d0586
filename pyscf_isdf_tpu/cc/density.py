"""CCSD response (Lambda) one-particle density matrix + properties.

The reference's ccsd_rdm/ccsd_lambda machinery computes
gamma_pq = <0|(1+Lambda) e^{-T} a_p^+ a_q e^{T}|0> from the Lambda
equations. Here Lambda is obtained EXACTLY as the left ground
eigenvector of the projected Hbar (same determinant-space transform as
cc/eom.py), and the density as the operator sandwich

    gamma_pq = L^T [e^{-T} (a_p^+ a_q) e^{T}] R / (L^T R)

— mathematically identical to the converged Lambda-equation response
density with zero transcription risk; small-system/oracle-grade cost.
For 2-electron systems the projected space is complete, so gamma must
equal the FCI density exactly (tested).
"""
from __future__ import annotations

from itertools import combinations

import numpy as np

from pyscf_isdf_tpu.cc.fci import build_hamiltonian, _phase
from pyscf_isdf_tpu.cc.eom import excitation_matrix, _expm_nilpotent


def _number_op_matrix(p, q, dets, index):
    """Matrix of a_p^+ a_q in the determinant basis."""
    ndet = len(dets)
    O = np.zeros((ndet, ndet))
    for I, d in enumerate(dets):
        occ = set(d)
        if q not in occ:
            continue
        if p != q and p in occ:
            continue
        dj = tuple(sorted(occ - {q} | {p}))
        J = index.get(dj)
        if J is None:
            continue
        d1 = tuple(sorted(occ - {q}))
        O[J, I] = _phase(d, q) * _phase(d1, p)
    return O


def ccsd_rdm1(h1so, eri_so, t1, t2, nocc):
    """Spin-orbital response 1-RDM of the CCSD ground state."""
    nso = h1so.shape[0]
    no = int(nocc)
    dets = list(combinations(range(nso), no))
    index = {d: i for i, d in enumerate(dets)}
    ref = tuple(range(no))

    H = build_hamiltonian(h1so, eri_so, dets)
    T = excitation_matrix(np.asarray(t1), np.asarray(t2), dets, no)
    eT = _expm_nilpotent(T, no + 2)
    eTm = _expm_nilpotent(-T, no + 2)
    Hbar = eTm @ H @ eT

    occ = set(ref)
    vir = [a for a in range(no, nso)]
    proj = [ref]
    for i in ref:
        for a in vir:
            proj.append(tuple(sorted(occ - {i} | {a})))
    for i, j in combinations(ref, 2):
        for a, b in combinations(vir, 2):
            proj.append(tuple(sorted(occ - {i, j} | {a, b})))
    idx = [index[d] for d in proj]
    Hp = Hbar[np.ix_(idx, idx)]

    wr, Vr = np.linalg.eig(Hp)
    i0 = np.argmin(wr.real)
    R = Vr[:, i0].real if np.abs(Vr[:, i0].imag).max() < 1e-10 \
        else Vr[:, i0]
    wl, Vl = np.linalg.eig(Hp.T)
    j0 = np.argmin(np.abs(wl - wr[i0]))
    L = Vl[:, j0].real if np.abs(Vl[:, j0].imag).max() < 1e-10 \
        else Vl[:, j0]
    norm = L @ R

    Rf = np.zeros(len(dets), dtype=R.dtype)
    Lf = np.zeros(len(dets), dtype=L.dtype)
    Rf[idx] = R
    Lf[idx] = L
    LeTm = Lf @ eTm
    eTR = eT @ Rf

    gamma = np.zeros((nso, nso))
    for p in range(nso):
        for q in range(nso):
            O = _number_op_matrix(p, q, dets, index)
            gamma[p, q] = np.real(LeTm @ (O @ eTR) / norm)
    return gamma


def fci_rdm1(h1so, eri_so, nelec):
    """FCI 1-RDM (oracle)."""
    nso = h1so.shape[0]
    dets = list(combinations(range(nso), nelec))
    index = {d: i for i, d in enumerate(dets)}
    H = build_hamiltonian(h1so, eri_so, dets)
    w, V = np.linalg.eigh(H)
    c = V[:, 0]
    gamma = np.zeros((nso, nso))
    for p in range(nso):
        for q in range(nso):
            O = _number_op_matrix(p, q, dets, index)
            gamma[p, q] = np.real(c.conj() @ (O @ c))
    return gamma
