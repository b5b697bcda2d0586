"""k-point CCSD (spin-orbital, momentum-blocked composite index).

The reference's KCCSD (pyscf/pbc/cc/kccsd.py) is spin-orbital CCSD over
Bloch orbitals with k-conservation enforced per contraction. Here the
same physics is expressed as ONE composite-index problem: spin orbital
(k, p, sigma) with the full k-conserving MO ERI tensor (df/fft_ao2mo
.ao2mo_7d) scattered into a momentum-blocked dense <PQ||RS> whose
non-conserving blocks are exactly zero. The Gamma-point gccsd kernel
(complex-Hermitian-safe orientations) then solves it unchanged — the
k-structure is data sparsity, not new control flow, which is the
TPU-friendly formulation (one big einsum program instead of nk^3 small
ones; XLA sees static shapes).

Normalization: composite ERIs are the supercell ERIs = (prim-cell
Bloch ERIs)/nk, the solved problem IS the nk-cell supercell, and the
returned e_corr is per unit cell (E_supercell/nk). Parity with the real
Gamma supercell is tested in tests/test_kccsd.py.
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu.cc import gccsd
from pyscf_isdf_tpu.df import fft_ao2mo
from pyscf_isdf_tpu.kpts_helper import get_kconserv


def build_composite_eris(system, scf_res):
    """(f_so, eri_so, nocc_so) on the occupied-first composite
    spin-orbital index."""
    mo_e = np.asarray(scf_res["mo_energy"])          # (nk, nmo)
    mo_c = [np.asarray(c) for c in scf_res["mo_coeff"]]
    mo_occ = np.asarray(scf_res["mo_occ"])           # (nk, nmo)
    kpts = system.kpts
    nk = len(kpts)
    nmo = mo_c[0].shape[1]
    n = nk * nmo

    eri7 = fft_ao2mo.ao2mo_7d(system, mo_c)          # (nk,nk,nk,nmo^4)
    kconserv = get_kconserv(system.cell.a, kpts)

    chem = np.zeros((n, n, n, n), dtype=complex)
    for kp in range(nk):
        for kq in range(nk):
            for kr in range(nk):
                ks = kconserv[kp, kq, kr]
                chem[kp * nmo:(kp + 1) * nmo, kq * nmo:(kq + 1) * nmo,
                     kr * nmo:(kr + 1) * nmo, ks * nmo:(ks + 1) * nmo] \
                    = eri7[kp, kq, kr] / nk
    # enforce the bra/ket swap symmetry (pq|rs) = (rs|pq) exactly: the
    # grid transform breaks it at the aliasing level (~1e-5), and the
    # blocked kernels (kccsd_blocked, krccsd) project it out — keeping
    # all paths on one common, physical fixed point
    chem = 0.5 * (chem + chem.transpose(2, 3, 0, 1))

    e_flat = mo_e.ravel()
    occ_flat = mo_occ.ravel() > 0.5
    # occupied-first ordering of the composite spatial index (stable, so
    # k-blocks stay contiguous within each of the two halves)
    perm = np.argsort(~occ_flat, kind="stable")
    chem = chem[np.ix_(perm, perm, perm, perm)]
    e_flat = e_flat[perm]
    nocc_sp = int(occ_flat.sum())

    _, eri_so = gccsd.spinorb_from_spatial(np.diag(e_flat), chem)
    f_so = np.diag(np.repeat(e_flat, 2))
    return f_so, eri_so, 2 * nocc_sp


def composite_h1so(system, scf_res):
    """Bare core Hamiltonian on the occupied-first composite spin-orbital
    index (momentum-off-diagonal blocks are exactly zero) — feeds the
    determinant-space EOM-KCCSD (cc/eom.py on composite integrals)."""
    from pyscf_isdf_tpu.cc import gccsd

    mo_c = [np.asarray(c) for c in scf_res["mo_coeff"]]
    mo_occ = np.asarray(scf_res["mo_occ"])
    nk = len(system.kpts)
    nmo = mo_c[0].shape[1]
    n = nk * nmo
    h1 = np.zeros((n, n), dtype=complex)
    for k in range(nk):
        h1[k * nmo:(k + 1) * nmo, k * nmo:(k + 1) * nmo] = \
            mo_c[k].conj().T @ np.asarray(system.hcore[k]) @ mo_c[k]
    occ_flat = mo_occ.ravel() > 0.5
    perm = np.argsort(~occ_flat, kind="stable")
    h1 = h1[np.ix_(perm, perm)]
    sp = np.arange(2 * n) // 2
    sz = np.arange(2 * n) % 2
    same = sz[:, None] == sz[None, :]
    # supercell normalization: <psi_sc|h|psi_sc> over nk cells equals the
    # primitive-cell matrix element (1/nk from |psi_sc|^2 x nk cells), so
    # h1 carries NO 1/nk — only the ERIs do (see build_composite_eris)
    return h1[np.ix_(sp, sp)] * same


def kccsd(system, scf_res, with_t=False, conv_tol=1e-9, max_cycle=100,
          verbose=False):
    """k-point CCSD correlation energy per unit cell on a converged
    KRHF/KRKS result (build_kscf_system + kscf_kernel)."""
    nk = len(system.kpts)
    f_so, eri_so, nocc_so = build_composite_eris(system, scf_res)
    out = gccsd.kernel(f_so, eri_so, nocc_so, conv_tol=conv_tol * nk,
                       max_cycle=max_cycle, verbose=verbose)
    out["e_corr"] = out["e_corr"] / nk
    out["e_hf"] = scf_res["e_tot"]
    out["e_tot"] = scf_res["e_tot"] + out["e_corr"]
    if with_t:
        out["e_t"] = gccsd.ccsd_t(out["t1"], out["t2"], f_so, eri_so,
                                  nocc_so) / nk
        out["e_tot"] += out["e_t"]
    return out


def build_composite_eris_uhf(system, scf_res):
    """(f_so, eri_so, nocc_so) on the occupied-first composite
    spin-orbital index for a KUHF/KUKS reference (per-spin spatial
    parts — the composite analog of kccsd_blocked's
    build_blocked_eris_uhf; reference pyscf/pbc/cc/kccsd_uhf.py)."""
    from pyscf_isdf_tpu.cc.gccsd import (antisymmetrize_spin_chem,
                                         uhf_spinorb_basis)

    ca_k, cb_k = scf_res["mo_coeff"]
    ea_k, eb_k = scf_res["mo_energy"]
    occ_a, occ_b = scf_res["mo_occ"]
    kpts = system.kpts
    nk = len(kpts)
    # per-k occupation counts may DIFFER (doped/metallic integer fills,
    # shifted meshes): the composite index flattens all k, so a per-k
    # occupancy flag + one global occupied-first stable sort handles
    # non-uniform fills with no padding (the restricted composite above
    # already works this way; reference counterpart: the _padding_k_idx
    # machinery of pyscf/pbc/mp/kmp2.py:228).
    na_k = (np.asarray(occ_a) > 0.5).sum(axis=1)
    nb_k = (np.asarray(occ_b) > 0.5).sum(axis=1)

    mo_cs, e_so_k, occ_l = [], [], []
    sz_l = []
    for k in range(nk):
        C_cat, e_so, sz, nocc_k = uhf_spinorb_basis(
            (ca_k[k], cb_k[k]), (ea_k[k], eb_k[k]),
            (int(na_k[k]), int(nb_k[k])))
        mo_cs.append(C_cat)
        e_so_k.append(e_so)
        occ_l.append(np.arange(len(e_so)) < nocc_k)
        sz_l.append(sz)
    nso_k = mo_cs[0].shape[1]
    n = nk * nso_k

    eri7 = fft_ao2mo.ao2mo_7d(system, mo_cs)      # (nk,nk,nk,nso_k^4)
    kconserv = get_kconserv(system.cell.a, kpts)
    chem = np.zeros((n, n, n, n), dtype=complex)
    for kp in range(nk):
        for kq in range(nk):
            for kr in range(nk):
                ks = kconserv[kp, kq, kr]
                chem[kp * nso_k:(kp + 1) * nso_k,
                     kq * nso_k:(kq + 1) * nso_k,
                     kr * nso_k:(kr + 1) * nso_k,
                     ks * nso_k:(ks + 1) * nso_k] = eri7[kp, kq, kr] / nk
    chem = 0.5 * (chem + chem.transpose(2, 3, 0, 1))

    e_flat = np.concatenate(e_so_k)
    occ_flat = np.concatenate(occ_l)
    sz_flat = np.concatenate(sz_l)
    perm = np.argsort(~occ_flat, kind="stable")
    chem = chem[np.ix_(perm, perm, perm, perm)]
    eri_so = antisymmetrize_spin_chem(chem, sz_flat[perm])
    f_so = np.diag(e_flat[perm])
    return f_so, eri_so, int(occ_flat.sum())


def kuccsd(system, scf_res, with_t=False, conv_tol=1e-9, max_cycle=100,
           verbose=False):
    """k-point spin-unrestricted CCSD (+ optional perturbative (T))
    correlation energy per unit cell on a converged KUHF/KUKS result —
    the composite dense tier, same cost class as the restricted
    composite :func:`kccsd` (which is already the shipped (T) route;
    reference pyscf/pbc/cc/kccsd_uhf.py + kccsd_t_rhf analog role)."""
    nk = len(system.kpts)
    f_so, eri_so, nocc_so = build_composite_eris_uhf(system, scf_res)
    out = gccsd.kernel(f_so, eri_so, nocc_so, conv_tol=conv_tol * nk,
                       max_cycle=max_cycle, verbose=verbose)
    out["e_corr"] = out["e_corr"] / nk
    out["e_hf"] = scf_res["e_tot"]
    out["e_tot"] = scf_res["e_tot"] + out["e_corr"]
    if with_t:
        out["e_t"] = gccsd.ccsd_t(out["t1"], out["t2"], f_so, eri_so,
                                  nocc_so) / nk
        out["e_tot"] += out["e_t"]
    return out
