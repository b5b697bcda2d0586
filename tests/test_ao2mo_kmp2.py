"""fft_ao2mo completeness (ao2mo_7d, public 4-kpt get_eri) and KMP2
frozen-core / padding / KUMP2.

Reference contracts: pyscf/pbc/df/fft_ao2mo.py:45-99 (get_eri k cases),
:342 (ao2mo_7d); pyscf/pbc/mp/kmp2.py:228 (padding), kump2.py.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.df import fft_ao2mo
from pyscf_isdf_tpu.kpts_helper import get_kconserv
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.mp.kmp2 import kmp2_energy, kump2_energy
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel


@pytest.fixture(scope="module")
def be_sys():
    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2.0, L / 2.0, L / 2.0)]],
                      basis="gth-szv", pseudo="gth-pade-q2", mesh=[12] * 3)
    kpts = lattice.make_kpts(cell.a, [3, 1, 1], wrap_around=True)
    return cell, kpts, build_kscf_system(cell, kpts)


def test_get_eri_kpts_cases(be_sys):
    """4-kpt AO ERI cases against a slow first-principles oracle."""
    cell, kpts, system = be_sys
    nao = cell.nao
    ng = cell.ngrids
    coords = cell.uniform_grid()
    from pyscf_isdf_tpu.ops import coulomb

    def oracle(i1, i2, i3, i4):
        """Direct Fourier-sum ERI: sum_G rho1(-G) v_q(G) rho2(G)."""
        ao = np.asarray(system.aoR_k)
        q = kpts[i2] - kpts[i1]
        coulG_q = coulomb.get_coulG(cell, k=q, exxdiv=None, kpts=kpts)
        rho1 = (ao[i1].conj()[:, :, None] * ao[i2][:, None, :]
                ).reshape(ng, -1) * np.exp(-1j * coords @ q)[:, None]
        rho2 = (ao[i3].conj()[:, :, None] * ao[i4][:, None, :]
                ).reshape(ng, -1) * np.exp(1j * coords @ q)[:, None]
        mesh = cell.mesh
        vG = np.fft.fftn(rho1.T.reshape(-1, *mesh),
                         axes=(1, 2, 3)).reshape(-1, ng) * coulG_q
        vR = np.fft.ifftn(vG.reshape(-1, *mesh), axes=(1, 2, 3)).reshape(-1, ng)
        return cell.grid_weight * (vR @ rho2)

    for case in [(0, 0, 0, 0), (0, 0, 1, 1), (0, 1, 1, 0), (0, 1, 2, 0)]:
        # check conservation of the 0123-style case first
        kconserv = get_kconserv(cell.a, kpts)
        if case == (0, 1, 2, 0):
            case = (0, 1, 2, int(kconserv[0, 1, 2]))
        eri = np.asarray(fft_ao2mo.get_eri_kpts(system, case))
        ref = oracle(*case)
        assert np.abs(eri - ref).max() < 1e-10, case

    with pytest.raises(ValueError):
        fft_ao2mo.get_eri_kpts(system, (0, 1, 0, 0))


def test_ao2mo_7d_reproduces_kmp2(be_sys):
    """KMP2 energy recomputed from the full ao2mo_7d tensor matches the
    production kernel (and hence the reference golden value)."""
    cell, kpts, system = be_sys
    nk = len(kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-12)
    e_ref = kmp2_energy(system, res)

    mo_c = res["mo_coeff"]
    mo_e = res["mo_energy"]
    nocc = cell.nelectron // 2
    eri7 = fft_ao2mo.ao2mo_7d(system, mo_c)
    kconserv = get_kconserv(cell.a, kpts)
    emp2 = 0.0
    for ki in range(nk):
        for kj in range(nk):
            for ka in range(nk):
                kb = kconserv[ki, ka, kj]
                o = eri7[ki, ka, kj][:nocc, nocc:, :nocc, nocc:] \
                    .transpose(0, 2, 1, 3) / nk
                o_sw = eri7[ki, kb, kj][:nocc, nocc:, :nocc, nocc:] \
                    .transpose(0, 2, 1, 3) / nk
                eia = mo_e[ki][:nocc, None] - mo_e[ka][None, nocc:]
                ejb = mo_e[kj][:nocc, None] - mo_e[kb][None, nocc:]
                d = eia[:, None, :, None] + ejb[None, :, None, :]
                t2 = np.conj(o / d)
                emp2 += 2 * np.einsum("ijab,ijab->", t2, o).real
                emp2 -= np.einsum("ijab,ijab->", t2,
                                  o_sw.transpose(0, 1, 3, 2)).real
    assert emp2 / nk == pytest.approx(e_ref, abs=1e-12)


def test_kmp2_frozen_equals_manual_truncation():
    """frozen=1 == dropping the lowest occupied column by hand."""
    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-12)
    nocc = cell.nelectron // 2
    e_frozen = kmp2_energy(system, res, frozen=1)
    res_trunc = dict(res)
    res_trunc["mo_coeff"] = [c[:, 1:] for c in res["mo_coeff"]]
    res_trunc["mo_energy"] = [e[1:] for e in res["mo_energy"]]
    res_trunc.pop("mo_occ", None)
    e_manual = kmp2_energy(system, res_trunc, nocc=nocc - 1)
    assert e_frozen == pytest.approx(e_manual, abs=1e-12)


def test_kmp2_padding_per_k_nocc(be_sys):
    """Per-k occupied counts pad without changing the uniform-count
    result (zero-padded amplitudes vanish identically)."""
    cell, kpts, system = be_sys
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-12)
    nocc = cell.nelectron // 2
    e_ref = kmp2_energy(system, res, nocc=nocc)
    # same counts passed per-k (exercises the padded code path shape)
    e_listed = kmp2_energy(system, res, nocc=[nocc] * len(kpts))
    assert e_listed == pytest.approx(e_ref, abs=1e-14)


def test_kump2_closed_shell_matches_kmp2():
    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=False)
    system = build_kscf_system(cell, kpts)
    res_r = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    e_rmp2 = kmp2_energy(system, res_r)
    res_u = kuhf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    assert res_u["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-8)
    e_ump2 = kump2_energy(system, res_u)
    assert e_ump2 == pytest.approx(e_rmp2, abs=1e-8)
