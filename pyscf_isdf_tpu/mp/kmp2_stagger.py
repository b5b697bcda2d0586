"""Staggered-mesh k-point MP2 (reduced finite-size error).

Reference behavior: pyscf/pbc/mp/kmp2_stagger.py (Xin Xing,
JCTC 2021, 17, 4733): occupied orbitals live on one Monkhorst-Pack mesh
and virtuals on a second mesh shifted by half a mesh step, which cancels
the leading finite-size error of the q->0 Coulomb singularity in the MP2
energy. Two modes, matching the reference:

  * ``flag_submesh=True`` (kmp2_stagger.py:372-389): the occupied/virtual
    meshes are the two half-size staggered submeshes of the SCF mesh —
    no extra SCF work, orbitals are reused from the converged k-SCF.
  * ``flag_submesh=False`` (kmp2_stagger.py:255-277): virtuals use the
    SCF mesh itself; occupieds are computed non-self-consistently at the
    half-step-shifted mesh via ``get_bands`` with ``exxdiv='vcut_sph'``
    (spherically truncated exchange kernel — finite at q=0, so the band
    energies on the shifted mesh need no probe-charge shift).

The energy contract is the standard KMP2 triple loop (ki, kj over the
occupied mesh; ka over the virtual mesh; kb = ki - ka + kj fixed by
momentum conservation, always a virtual-mesh point because the two
meshes differ by exactly half a virtual-mesh step), with 1/nk_ov
normalization (kmp2_stagger.py:100-137).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.df import fft_ao2mo
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.scf.bands import get_bands


def _mp_size(a, kpts) -> np.ndarray:
    """Monkhorst-Pack mesh size from the k-point set (per-axis unique
    fractional coordinates; reference tools/pbc.py:514)."""
    b_inv = np.asarray(a, dtype=np.float64).T / (2 * np.pi)
    scaled = kpts @ b_inv
    return np.array([len(np.unique(np.round(scaled[:, x] % 1.0, 8)))
                     for x in range(3)])


def _match_kpts(a, kpts_sub, kpts_all) -> np.ndarray:
    """Indices of each kpts_sub point inside kpts_all (both mapped to the
    first BZ by fractional rounding; reference round_to_fbz matching,
    kmp2_stagger.py:295-311)."""
    b_inv = np.asarray(a, dtype=np.float64).T / (2 * np.pi)
    f_all = np.round(kpts_all @ b_inv, 8) % 1.0
    f_sub = np.round(kpts_sub @ b_inv, 8) % 1.0
    idx = []
    for f in f_sub:
        d = np.abs(f_all - f)
        d = np.minimum(d, 1.0 - d).sum(axis=1)
        j = int(np.argmin(d))
        if d[j] > 1e-8:
            raise RuntimeError(
                "staggered submesh point not found in the SCF k-mesh")
        idx.append(j)
    idx = np.asarray(idx)
    if len(np.unique(idx)) != len(idx):
        raise RuntimeError("staggered submesh matching is not one-to-one")
    return idx


def kmp2_stagger_energy(system, kscf_res, nocc=None, flag_submesh=False,
                        xc=None) -> float:
    """Staggered-mesh KMP2 correlation energy from a converged k-SCF.

    Args:
        system: KSCFSystem whose kpts are a Gamma-centered MP mesh.
        kscf_res: result dict of kscf_kernel.
        nocc: occupied count per k (int); default nelectron // 2.
        flag_submesh: True -> reuse the two half-size staggered submeshes
            of the SCF mesh; False -> non-SCF band calculation on the
            half-step-shifted mesh (reference's two modes).
        xc: functional of the SCF (for the non-SCF Fock build).
    """
    cell = system.cell
    a = cell.a
    kpts = np.asarray(system.kpts)
    mesh = system.mesh
    weight = system.weight
    coords = cell.uniform_grid()
    no = int(nocc) if nocc is not None else cell.nelectron // 2
    nks = _mp_size(a, kpts)
    b = lattice.reciprocal_vectors(a)

    if flag_submesh:
        if np.any(nks % 2):
            raise RuntimeError(
                "SCF k-mesh has odd size; staggered submeshes need an even "
                "mesh (set flag_submesh=False)")
        nks_ov = nks // 2
        shift = kpts[np.argmin(np.sum(kpts**2, axis=1))]
        half_shift = np.array([0.5 / n for n in nks_ov]) @ b
        kpts_vir = shift + lattice.make_kpts(a, nks_ov, with_gamma_point=True)
        kpts_occ = kpts_vir + half_shift
        idx_vir = _match_kpts(a, kpts_vir, kpts)
        idx_occ = _match_kpts(a, kpts_occ, kpts)
        mo_e = [np.asarray(e) for e in kscf_res["mo_energy"]]
        mo_c = kscf_res["mo_coeff"]
        moR = [np.asarray(system.aoR_k[k]) @ np.asarray(mo_c[k])
               for k in range(len(kpts))]
        occ_k = [(kpts[k], moR[k][:, :no], mo_e[k][:no]) for k in idx_occ]
        vir_k = [(kpts[k], moR[k][:, no:], mo_e[k][no:]) for k in idx_vir]
    else:
        half_shift = np.array([0.5 / n for n in nks]) @ b
        kpts_vir = kpts
        kpts_occ = kpts + half_shift
        kpts_all = np.concatenate([kpts_occ, kpts_vir])
        # Non-SCF orbitals/energies on BOTH meshes with the truncated
        # exchange kernel (reference kmp2_stagger.py:268-272: temporary
        # exxdiv='vcut_sph' so the two meshes are treated consistently).
        mo_e_all, mo_c_all = get_bands(system, kscf_res, kpts_all, xc=xc,
                                       exxdiv="vcut_sph")
        nk_all = len(kpts_all)
        # global Fermi fill over the union mesh (reference reuses
        # khf.get_occ on the concatenated set, kmp2_stagger.py:272)
        order = np.argsort(np.concatenate(mo_e_all))
        nmo = len(mo_e_all[0])
        occ_cnt = np.zeros(nk_all, dtype=int)
        for o in order[: no * nk_all]:
            occ_cnt[o // nmo] += 1
        if (np.any(occ_cnt[:len(kpts)] != no)
                or np.any(occ_cnt[len(kpts):] != no)):
            raise RuntimeError(
                "non-uniform occupations across the staggered meshes "
                "(metallic fill) — staggered-mesh MP2 needs a gapped fill")
        occ_k, vir_k = [], []
        for i, kv in enumerate(kpts_occ):
            aoRb = eval_ao_numpy(cell, kpt=kv)
            m = aoRb @ mo_c_all[i]
            occ_k.append((kv, m[:, :no], np.asarray(mo_e_all[i][:no])))
        for i, kv in enumerate(kpts_vir):
            j = i + len(kpts_occ)
            aoRb = np.asarray(system.aoR_k[i])
            m = aoRb @ mo_c_all[j]
            vir_k.append((kv, m[:, no:], np.asarray(mo_e_all[j][no:])))

    nk_ov = len(vir_k)
    # virtual-mesh lookup by fractional coordinates for kb matching
    b_inv = np.asarray(a, dtype=np.float64).T / (2 * np.pi)
    vir_frac = {tuple(np.round(kv @ b_inv, 6) % 1.0): i
                for i, (kv, _, _) in enumerate(vir_k)}

    def vir_index(k_target):
        key = tuple(np.round(k_target @ b_inv, 6) % 1.0)
        if key not in vir_frac:
            # retry with rounding-tolerant scan
            f = np.asarray(key)
            for kk, i in vir_frac.items():
                d = np.abs(np.asarray(kk) - f)
                if np.minimum(d, 1.0 - d).sum() < 1e-5:
                    return i
            raise RuntimeError("momentum-conserving kb not on the "
                               "virtual mesh")
        return vir_frac[key]

    emp2 = 0.0
    for ki, (k_i, mo_i, e_i) in enumerate(occ_k):
        for kj, (k_j, mo_j, e_j) in enumerate(occ_k):
            oovv = {}
            kb_of = {}
            for ka, (k_a, mo_a, e_a) in enumerate(vir_k):
                ikb = vir_index(k_i - k_a + k_j)
                kb_of[ka] = ikb
                k_b, mo_b, e_b = vir_k[ikb]
                q = k_a - k_i
                coulG_q = coulomb.get_coulG(cell, k=q, exxdiv=None,
                                            kpts=kpts)
                expmiqr = np.exp(-1j * coords @ q)
                eri = fft_ao2mo.general_kpts(
                    jnp.asarray(mo_i), jnp.asarray(mo_a),
                    jnp.asarray(mo_j), jnp.asarray(mo_b),
                    jnp.asarray(coulG_q), jnp.asarray(expmiqr),
                    mesh, weight)
                nv = mo_a.shape[1]
                oovv[ka] = (np.asarray(eri).reshape(no, nv, no, nv)
                            .transpose(0, 2, 1, 3) / nk_ov)
            for ka, (k_a, mo_a, e_a) in enumerate(vir_k):
                ikb = kb_of[ka]
                e_b = vir_k[ikb][2]
                eia = e_i[:, None] - e_a
                ejb = e_j[:, None] - e_b
                eijab = eia[:, None, :, None] + ejb[None, :, None, :]
                t2 = np.conj(oovv[ka] / eijab)
                emp2 += 2 * np.einsum("ijab,ijab->", t2, oovv[ka]).real
                emp2 -= np.einsum(
                    "ijab,ijab->", t2,
                    oovv[ikb].transpose(0, 1, 3, 2)).real
    return float(emp2 / nk_ov)
