"""Space-group symmetry, IBZ k-point reduction, and IBZ SCF parity.

Reference contract: pyscf/pbc/lib/kpts.py (make_kpts_ibz :32, dm transforms
:441-631) and pyscf/pbc/scf/khf_ksymm.py — the IBZ SCF must reproduce the
full-BZ energy with nk_ibz < nk.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import lattice, symm
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.scf.khf_ksymm import kscf_ibz_kernel

# the slowest non-slow module (60-150 s/test on 1 core; VERDICT r2 weak
# #8) — still in the default run, deselectable with -m "not heavy"
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def diamond24():
    return diamond_primitive(mesh=(24, 24, 24))


@pytest.fixture(scope="module")
def sys222(diamond24):
    kpts = lattice.make_kpts(diamond24.a, [2, 2, 2])
    return build_kscf_system(diamond24, kpts)


def test_space_group_ops_diamond(diamond24):
    ops = symm.space_group_ops(diamond24)
    # diamond (Fd-3m): 48 point ops, half non-symmorphic in the 2-atom cell
    assert len(ops) == 48
    n_nonsymm = sum(1 for op in ops if np.linalg.norm(op.t) > 1e-8)
    assert n_nonsymm == 24
    # closure sanity: every op's rotation is orthogonal
    for op in ops:
        assert np.allclose(op.R @ op.R.T, np.eye(3), atol=1e-10)


def test_make_kpts_ibz_diamond(diamond24):
    kpts = lattice.make_kpts(diamond24.a, [2, 2, 2])
    info = symm.make_kpts_ibz(diamond24, kpts)
    assert info.nk == 8
    assert info.nk_ibz == 3
    assert info.weights.sum() == 8
    kpts3 = lattice.make_kpts(diamond24.a, [3, 3, 3])
    info3 = symm.make_kpts_ibz(diamond24, kpts3)
    assert info3.nk_ibz == 4
    assert info3.weights.sum() == 27


def test_overlap_covariance(diamond24, sys222):
    """P S_k P^H == S_{Rk} to machine precision (validates Wigner blocks,
    atom permutations and translation phases all at once)."""
    info = symm.make_kpts_ibz(diamond24, sys222.kpts)
    for j in range(info.nk):
        r = int(info.bz2ibz[j])
        i = int(info.ibz_idx[r])
        P = symm.ao_rotation_matrix(diamond24, info.ops[int(info.op_idx[j])],
                                    info.kpts[i])
        S = P @ sys222.S[i] @ P.conj().T
        if info.tr[j]:
            S = S.conj()
        assert np.abs(S - sys222.S[j]).max() < 1e-12


def test_expand_dm_reproduces_full_bz(diamond24, sys222):
    res = kscf_kernel(sys222, xc=None, exxdiv="ewald", conv_tol=1e-11)
    info = symm.make_kpts_ibz(diamond24, sys222.kpts)
    dm_full = np.asarray(res["dm"])
    dm_exp = symm.expand_dm(diamond24, info, dm_full[info.ibz_idx])
    # limited by the mesh's own symmetry-breaking collocation error
    assert np.abs(dm_exp - dm_full).max() < 1e-6


def test_ibz_krhf_matches_full_bz(sys222):
    ref = kscf_kernel(sys222, xc=None, exxdiv="ewald", conv_tol=1e-10)
    res = kscf_ibz_kernel(sys222, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)


def test_ibz_krks_pbe0_isdf_matches_full_bz(sys222):
    """Hybrid KRKS on the IBZ with ISDF exchange == full-BZ FFTDF.

    The bound is the ISDF c=10 truncation error (~1e-7 on this system),
    not the IBZ reduction — test_ibz_krhf_matches_full_bz pins the IBZ
    machinery itself at 1e-8 with exact exchange.
    """
    ref = kscf_kernel(sys222, xc="pbe0", exxdiv="ewald", conv_tol=1e-9)
    res = kscf_ibz_kernel(sys222, xc="pbe0", exxdiv="ewald", conv_tol=1e-9,
                          df="isdf", isdf_c=10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=2e-7)


def test_frontend_symmetry_flag(diamond24):
    import pyscf_isdf_tpu as pit

    kpts = lattice.make_kpts(diamond24.a, [2, 2, 2])
    e_ref = pit.KRKS(diamond24, kpts, xc="lda,vwn").run()
    mf = pit.KRKS(diamond24, kpts, xc="lda,vwn", symmetry=True)
    e = mf.run()
    assert mf.converged
    assert e == pytest.approx(e_ref, abs=1e-8)


def test_kmp2_ksymm_matches_full(diamond24):
    """IBZ-weighted KMP2 (expanded MOs + irreducible ki loop) == full-BZ
    KMP2 (reference kmp2_ksymm.py contract)."""
    from pyscf_isdf_tpu.mp.kmp2 import kmp2_energy, kmp2_ksymm_energy
    from pyscf_isdf_tpu.scf.khf import kscf_kernel

    cell = diamond_primitive(mesh=(14, 14, 14))
    kpts = lattice.make_kpts(cell.a, [2, 2, 2])
    system = build_kscf_system(cell, kpts)
    res_full = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    e_full = kmp2_energy(system, res_full)
    res_ibz = kscf_ibz_kernel(system, xc=None, exxdiv="ewald",
                              conv_tol=1e-11)
    assert res_ibz["ibz"].nk_ibz < len(kpts)
    e_sym = kmp2_ksymm_energy(system, res_ibz)
    # bound set by collocation-aliasing symmetry breaking of the SCF
    # reference at this mesh (orbit mo_e spread ~1e-5 at 14^3; the
    # measured ibz-vs-full gap is 8e-8), not by the ksymm reduction
    assert e_sym == pytest.approx(e_full, abs=1e-6)


def test_ibz_smearing_matches_full_bz(sys222):
    """Smeared (fermi, sigma=0.05) IBZ SCF == full-BZ smeared SCF: the
    weighted chemical-potential search over the IBZ spectrum must
    reproduce the k-stacked mu, entropy and free energy (reference
    pyscf/pbc/scf/addons.py smearing_ with kpts.weights_ibz)."""
    ref = kscf_kernel(sys222, xc=None, exxdiv="ewald", conv_tol=1e-10,
                      sigma=0.05)
    res = kscf_ibz_kernel(sys222, xc=None, exxdiv="ewald", conv_tol=1e-10,
                          sigma=0.05)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(ref["e_tot"], abs=1e-8)
    assert res["entropy"] == pytest.approx(ref["entropy"], abs=1e-7)
    assert res["mu"] == pytest.approx(ref["mu"], abs=1e-6)
    assert res["e_free"] == pytest.approx(ref["e_free"], abs=1e-8)
    # smearing actually bites at this sigma (fractional occupations)
    assert res["entropy"] > 1e-8


def test_frontend_smearing_with_symmetry(diamond24):
    import pyscf_isdf_tpu as pit

    kpts = lattice.make_kpts(diamond24.a, [2, 2, 2])
    mf = pit.KRHF(diamond24, kpts, symmetry=True)
    mf.smearing(0.05)
    e = mf.run()
    assert mf.converged
    ref = pit.KRHF(diamond24, kpts)
    ref.smearing(0.05)
    e_ref = ref.run()
    assert e == pytest.approx(e_ref, abs=1e-8)
