"""k-point restricted and unrestricted MP2 (KMP2 / KUMP2).

Energy contract per the reference kernel (pyscf/pbc/mp/kmp2.py:45-155):
triple loop over (ki, kj, ka) with kb from momentum conservation, MO ERIs
from the FFT-grid transform (the ``with_df.ao2mo`` fallback path,
kmp2.py:119-126), t2 = conj(oovv/e_ijab), and

    E2 = (1/nk) sum [ 2 t2.oovv(ka) - t2.oovv_swapped(kb) ].

Frozen core and per-k occupation padding (the reference's
``_padding_k_idx`` machinery, kmp2.py:228) are handled by padding every
k to the max occupied/virtual counts with zero MO columns and sentinel
energies — padded amplitudes vanish identically, so the k loops stay
static-shaped (the TPU-friendly formulation).

KUMP2 (reference pyscf/pbc/mp/kump2.py): same-spin channels use the
antisymmetrized pair energy E_ss = 1/2 sum conj(o)/D (o - o_swap); the
opposite-spin channel E_os = sum |o_ab|^2 / D. The closed-shell limit
reproduces KMP2 exactly (tested).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fft_ao2mo
from pyscf_isdf_tpu.kpts_helper import get_kconserv
from pyscf_isdf_tpu.ops import coulomb

_PAD_E = 1e9  # sentinel orbital energy: padded amplitudes ~ 1/1e9 -> 0


def _pad_spaces(aoR_k, mo_c, mo_e, nocc_k, frozen):
    """Per-k occupied/virtual grids and energies, padded to common sizes.

    Padded occupied columns are zero with energy -_PAD_E; padded virtuals
    zero with +_PAD_E, so their MP2 contributions are exactly zero.
    """
    nk = len(mo_c)
    nmo = mo_c[0].shape[1]
    nocc_k = [int(n) - frozen for n in nocc_k]
    if any(n <= 0 for n in nocc_k):
        raise ValueError("frozen count leaves no occupied orbitals")
    no = max(nocc_k)
    nv = max(nmo - frozen - n for n in nocc_k)
    moR_o, moR_v, e_o, e_v = [], [], [], []
    for k in range(nk):
        n_k = nocc_k[k]
        m = np.asarray(aoR_k[k]) @ mo_c[k]
        ng = m.shape[0]
        o = np.zeros((ng, no), dtype=m.dtype)
        v = np.zeros((ng, nv), dtype=m.dtype)
        eo = np.full(no, -_PAD_E)
        ev = np.full(nv, _PAD_E)
        o[:, :n_k] = m[:, frozen:frozen + n_k]
        v[:, :nmo - frozen - n_k] = m[:, frozen + n_k:]
        eo[:n_k] = np.asarray(mo_e[k][frozen:frozen + n_k])
        ev[:nmo - frozen - n_k] = np.asarray(mo_e[k][frozen + n_k:])
        moR_o.append(jnp.asarray(o))
        moR_v.append(jnp.asarray(v))
        e_o.append(eo)
        e_v.append(ev)
    return moR_o, moR_v, e_o, e_v


def _q_kernel(cell, kpts, coords, ki, ka):
    q = kpts[ka] - kpts[ki]
    coulG_q = coulomb.get_coulG(cell, k=q, exxdiv=None, kpts=kpts)
    expmiqr = np.exp(-1j * coords @ q)
    return jnp.asarray(coulG_q), jnp.asarray(expmiqr)


def kmp2_energy(system, kscf_res, nocc=None, frozen: int = 0,
                ki_list=None, ki_weights=None) -> float:
    """KMP2 correlation energy from a converged KRHF result.

    Args:
        system: KSCFSystem.
        kscf_res: result of kscf_kernel (uses mo_coeff/mo_energy at all k).
        nocc: occupied count — int (uniform), per-k list, or None (from
            mo_occ when present, else nelectron/2).
        frozen: number of frozen-core orbitals per k-point.
        ki_list / ki_weights: optional restriction of the outer ki loop
            to symmetry-irreducible k-points with orbit-size weights
            (sum = nk) — the reference's kmp2_ksymm reduction
            (pyscf/pbc/mp/kmp2_ksymm.py); exact by the invariance of the
            (kj, ka) inner sums under the ki orbit.
    """
    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    mo_e = kscf_res["mo_energy"]
    mo_c = kscf_res["mo_coeff"]
    if nocc is None:
        if "mo_occ" in kscf_res and kscf_res["mo_occ"] is not None:
            nocc_k = [int(round(float(np.sum(o)) / 2)) for o in
                      kscf_res["mo_occ"]]
        else:
            nocc_k = [cell.nelectron // 2] * nk
    elif np.isscalar(nocc):
        nocc_k = [int(nocc)] * nk
    else:
        nocc_k = [int(n) for n in nocc]

    kconserv = get_kconserv(cell.a, kpts)
    coords = cell.uniform_grid()
    mesh = system.mesh
    weight = system.weight
    moR_o, moR_v, e_o, e_v = _pad_spaces(system.aoR_k, mo_c, mo_e, nocc_k,
                                         frozen)
    no = moR_o[0].shape[1]
    nv = moR_v[0].shape[1]

    if ki_list is None:
        ki_list = range(nk)
        ki_weights = [1.0] * nk

    emp2 = 0.0
    for ki, w_i in zip(ki_list, ki_weights):
        for kj in range(nk):
            oovv = {}
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                coulG_q, expmiqr = _q_kernel(cell, kpts, coords, ki, ka)
                eri = fft_ao2mo.general_kpts(
                    moR_o[ki], moR_v[ka], moR_o[kj], moR_v[kb],
                    coulG_q, expmiqr, mesh, weight,
                )
                oovv[ka] = (
                    np.asarray(eri).reshape(no, nv, no, nv)
                    .transpose(0, 2, 1, 3) / nk
                )
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                eia = e_o[ki][:, None] - e_v[ka]
                ejb = e_o[kj][:, None] - e_v[kb]
                eijab = eia[:, None, :, None] + ejb[None, :, None, :]
                t2 = np.conj(oovv[ka] / eijab)
                edi = np.einsum("ijab,ijab->", t2, oovv[ka]).real * 2
                exi = -np.einsum("ijab,ijab->", t2,
                                 oovv[kb].transpose(0, 1, 3, 2)).real
                emp2 += w_i * (edi + exi)
    return float(emp2 / nk)


def kmp2_ksymm_energy(system, ibz_res, nocc=None, frozen: int = 0) -> float:
    """KMP2 on an IBZ-symmetry SCF result (reference kmp2_ksymm.py).

    Expands the IBZ MOs to the full BZ through the space-group AO
    rotations (symm.expand_mos) and restricts the outer ki loop to the
    irreducible wedge with orbit weights — an nk/nk_ibz reduction of
    both the SCF that produced the orbitals and the MP2 triple loop.

    Args:
        system: KSCFSystem built on the FULL k-point set.
        ibz_res: result dict of kscf_ibz_kernel (carries the IBZInfo).
    """
    from pyscf_isdf_tpu import symm

    info = ibz_res["ibz"]
    mo_e, mo_c = symm.expand_mos(system.cell, info, ibz_res["mo_coeff"],
                                 ibz_res["mo_energy"])
    res_full = {"mo_energy": mo_e, "mo_coeff": mo_c}
    return kmp2_energy(system, res_full, nocc=nocc, frozen=frozen,
                       ki_list=[int(i) for i in info.ibz_idx],
                       ki_weights=[float(w) for w in info.weights])


def kump2_energy(system, kuhf_res, nocc=None, frozen: int = 0) -> float:
    """KUMP2 correlation energy from a converged KUHF result.

    Args:
        kuhf_res: result of kuhf_kernel — mo_energy/(mo_coeff) are
            (alpha, beta) tuples of per-k lists.
        nocc: (na, nb) per-spin occupied counts, or None (from cell).
    """
    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    ea, eb = kuhf_res["mo_energy"]
    ca, cb = kuhf_res["mo_coeff"]
    if nocc is None:
        na = (cell.nelectron + cell.spin) // 2
        nb = cell.nelectron - na
    else:
        na, nb = nocc

    kconserv = get_kconserv(cell.a, kpts)
    coords = cell.uniform_grid()
    mesh = system.mesh
    weight = system.weight
    spaces = {
        0: _pad_spaces(system.aoR_k, ca, ea, [na] * nk, frozen),
        1: _pad_spaces(system.aoR_k, cb, eb, [nb] * nk, frozen),
    }

    def oovv_block(s1, s2, ki, kj, ka, kb):
        o1, v1, eo1, ev1 = spaces[s1]
        o2, v2, eo2, ev2 = spaces[s2]
        coulG_q, expmiqr = _q_kernel(cell, kpts, coords, ki, ka)
        no1, nv1 = o1[0].shape[1], v1[0].shape[1]
        no2, nv2 = o2[0].shape[1], v2[0].shape[1]
        eri = fft_ao2mo.general_kpts(o1[ki], v1[ka], o2[kj], v2[kb],
                                     coulG_q, expmiqr, mesh, weight)
        oovv = (np.asarray(eri).reshape(no1, nv1, no2, nv2)
                .transpose(0, 2, 1, 3) / nk)
        eia = eo1[ki][:, None] - ev1[ka]
        ejb = eo2[kj][:, None] - ev2[kb]
        return oovv, eia[:, None, :, None] + ejb[None, :, None, :]

    emp2 = 0.0
    for ki in range(nk):
        for kj in range(nk):
            # opposite spin (alpha-beta): E_os = sum |o|^2 / D
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                o, d = oovv_block(0, 1, ki, kj, ka, kb)
                emp2 += np.einsum("ijab,ijab->", np.conj(o) / d, o).real
            # same spin: E_ss = 1/2 sum conj(o)/D (o - o_swap)
            for s in (0, 1):
                oovv = {}
                for ka in range(nk):
                    kb = kconserv[ki, ka, kj]
                    oovv[ka] = oovv_block(s, s, ki, kj, ka, kb)
                for ka in range(nk):
                    kb = kconserv[ki, ka, kj]
                    o, d = oovv[ka]
                    oswap = oovv[kb][0].transpose(0, 1, 3, 2)
                    t2 = np.conj(o / d)
                    emp2 += 0.5 * (np.einsum("ijab,ijab->", t2, o).real
                                   - np.einsum("ijab,ijab->", t2, oswap).real)
    return float(emp2 / nk)
