"""k-point restricted MP2 (KMP2).

Energy contract per the reference kernel (pyscf/pbc/mp/kmp2.py:45-155):
triple loop over (ki, kj, ka) with kb from momentum conservation, MO ERIs
from the FFT-grid transform (the ``with_df.ao2mo`` fallback path,
kmp2.py:119-126), t2 = conj(oovv/e_ijab), and

    E2 = (1/nk) sum [ 2 t2.oovv(ka) - t2.oovv_swapped(kb) ].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fft_ao2mo
from pyscf_isdf_tpu.kpts_helper import get_kconserv
from pyscf_isdf_tpu.ops import coulomb


def kmp2_energy(system, kscf_res, nocc=None) -> float:
    """KMP2 correlation energy from a converged KRHF result.

    Args:
        system: KSCFSystem.
        kscf_res: result of kscf_kernel (uses mo_coeff/mo_energy at all k).
    """
    cell = system.cell
    kpts = system.kpts
    nk = len(kpts)
    mo_e = kscf_res["mo_energy"]
    mo_c = kscf_res["mo_coeff"]
    if nocc is None:
        nocc = cell.nelectron // 2
    nmo = mo_c[0].shape[1]
    nvir = nmo - nocc

    kconserv = get_kconserv(cell.a, kpts)
    coords = cell.uniform_grid()
    mesh = system.mesh
    weight = system.weight

    # Bloch MOs on the grid
    moR = [np.asarray(system.aoR_k[k]) @ mo_c[k] for k in range(nk)]
    moR_o = [jnp.asarray(m[:, :nocc]) for m in moR]
    moR_v = [jnp.asarray(m[:, nocc:]) for m in moR]

    e_o = [np.asarray(mo_e[k][:nocc]) for k in range(nk)]
    e_v = [np.asarray(mo_e[k][nocc:]) for k in range(nk)]

    # per (ki, ka) momentum-transfer kernels
    def q_kernel(ki, ka):
        q = kpts[ka] - kpts[ki]
        coulG_q = coulomb.get_coulG(cell, k=q, exxdiv=None, kpts=kpts)
        expmiqr = np.exp(-1j * coords @ q)
        return jnp.asarray(coulG_q), jnp.asarray(expmiqr)

    emp2 = 0.0
    for ki in range(nk):
        for kj in range(nk):
            oovv = {}
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                coulG_q, expmiqr = q_kernel(ki, ka)
                eri = fft_ao2mo.general_kpts(
                    moR_o[ki], moR_v[ka], moR_o[kj], moR_v[kb],
                    coulG_q, expmiqr, mesh, weight,
                )
                oovv[ka] = (
                    np.asarray(eri).reshape(nocc, nvir, nocc, nvir)
                    .transpose(0, 2, 1, 3) / nk
                )
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                eia = e_o[ki][:, None] - e_v[ka]
                ejb = e_o[kj][:, None] - e_v[kb]
                eijab = eia[:, None, :, None] + ejb[None, :, None, :]
                t2 = np.conj(oovv[ka] / eijab)
                edi = np.einsum("ijab,ijab->", t2, oovv[ka]).real * 2
                exi = -np.einsum("ijab,ijba->", t2, oovv[kb]).real
                emp2 += edi + exi
    return float(emp2 / nk)
