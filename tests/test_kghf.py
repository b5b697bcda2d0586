"""KGHF contracts: exact KRHF limit (closed shell) and exact KUHF limit
(collinear spin-polarized), matching the reference's class relationships
(pyscf/pbc/scf/kghf.py is the spinor generalization of khf/kuhf)."""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.scf.kghf import kghf_kernel
from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel


@pytest.fixture(scope="module")
def h2_system():
    a = 6.0 * np.eye(3)
    cell = build_cell(a, [["H", (3.0, 3.0, 2.4)], ["H", (3.0, 3.0, 3.6)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[18] * 3)
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=True)
    return build_kscf_system(cell, kpts)


def test_kghf_closed_shell_equals_krhf(h2_system):
    res_r = kscf_kernel(h2_system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    res_g = kghf_kernel(h2_system, exxdiv="ewald", conv_tol=1e-11)
    assert res_g["converged"]
    assert res_g["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-8)
    sx, sy, sz = res_g["spin"]
    assert abs(sx) < 1e-6 and abs(sy) < 1e-6 and abs(sz) < 1e-6


def test_kghf_collinear_equals_kuhf():
    # spin-polarized H chain cell: 1 H per cell, odd electron count
    a = np.diag([6.0, 6.0, 3.0])
    cell = build_cell(a, [["H", (3.0, 3.0, 1.5)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[15, 15, 9],
                      spin=1)
    kpts = lattice.make_kpts(cell.a, [1, 1, 2], with_gamma_point=True)
    system = build_kscf_system(cell, kpts)
    res_u = kuhf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    # embed the collinear KUHF density in the spinor diagonal blocks
    dm_a, dm_b = np.asarray(res_u["dm"][0]), np.asarray(res_u["dm"][1])
    nk, nao = dm_a.shape[0], dm_a.shape[1]
    dm0 = np.zeros((nk, 2 * nao, 2 * nao), dtype=np.complex128)
    dm0[:, :nao, :nao] = dm_a
    dm0[:, nao:, nao:] = dm_b
    res_g = kghf_kernel(system, exxdiv="ewald", conv_tol=1e-11, dm0=dm0)
    assert res_g["converged"]
    assert res_g["e_tot"] == pytest.approx(res_u["e_tot"], abs=1e-8)
    # net collinear moment preserved: <Sz> = (N_a - N_b)/2 per cell
    assert res_g["spin"][2] == pytest.approx(0.5, abs=1e-6)


def test_exact_count_occ_degenerate_ties():
    """<=fermi threshold overfilled degenerate Fermi levels; the argsort
    filler must occupy exactly n states (ADVICE r2: spin-free spinor
    spectra are exactly 2x degenerate, so odd electron counts always tie)."""
    from pyscf_isdf_tpu.scf.occupations import exact_count_occ

    # doubly degenerate spectrum, fill an odd count
    e_k = [np.array([-1.0, -1.0, 0.5, 0.5]), np.array([-0.2, -0.2, 1.0, 1.0])]
    occ = exact_count_occ(e_k, 3, scale=1.0)
    assert sum(o.sum() for o in occ) == pytest.approx(3.0)
    # the two lowest (-1, -1) plus ONE of the (-0.2, -0.2) pair
    assert occ[0].tolist() == [1.0, 1.0, 0.0, 0.0]
    assert occ[1].sum() == pytest.approx(1.0)
    # closed-shell scale
    occ2 = exact_count_occ(e_k, 2, scale=2.0)
    assert sum(o.sum() for o in occ2) == pytest.approx(4.0)


def test_kghf_odd_electron_charge(h2_system):
    """KGHF with dm0=None on an odd electron count must converge a state
    with exactly nelec electrons (tr(D S) == nelec), not nelec+1."""
    a = np.diag([6.0, 6.0, 3.0])
    cell = build_cell(a, [["H", (3.0, 3.0, 1.5)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[15, 15, 9],
                      spin=1)
    kpts = lattice.make_kpts(cell.a, [1, 1, 2], with_gamma_point=True)
    system = build_kscf_system(cell, kpts)
    res = kghf_kernel(system, exxdiv="ewald", conv_tol=1e-9)
    nk = len(kpts)
    nao = system.S.shape[-1]
    S_sp = np.zeros((nk, 2 * nao, 2 * nao), dtype=system.S.dtype)
    S_sp[:, :nao, :nao] = system.S
    S_sp[:, nao:, nao:] = system.S
    ne = sum(np.trace(res["dm"][k] @ S_sp[k]).real for k in range(nk)) / nk
    assert ne == pytest.approx(cell.nelectron, abs=1e-8)


def test_kghf_isdf_exchange():
    """ISDF spinor exchange == exact pair-FFT exchange, exercised on a
    state with NON-HERMITIAN off-diagonal spin blocks: a collinear
    density rotated by a global spin rotation (energy invariant, d_ab
    non-zero). The ISDF contraction is complex-linear in the density
    with no Hermiticity assumption, so one per-q W serves all blocks."""
    a = np.diag([6.0, 6.0, 3.0])
    cell = build_cell(a, [["H", (3.0, 3.0, 1.5)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[15, 15, 9],
                      spin=1)
    kpts = lattice.make_kpts(cell.a, [1, 1, 2], with_gamma_point=True)
    system = build_kscf_system(cell, kpts)
    res_u = kuhf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    dm_a, dm_b = np.asarray(res_u["dm"][0]), np.asarray(res_u["dm"][1])
    nk, nao = dm_a.shape[0], dm_a.shape[1]
    dm0 = np.zeros((nk, 2 * nao, 2 * nao), dtype=np.complex128)
    dm0[:, :nao, :nao] = dm_a
    dm0[:, nao:, nao:] = dm_b
    # global SU(2) rotation by theta about y: tilts Sz into Sx and
    # populates the ab/ba blocks (non-Hermitian individually)
    th = 0.7
    U = np.kron(np.array([[np.cos(th / 2), -np.sin(th / 2)],
                          [np.sin(th / 2), np.cos(th / 2)]]), np.eye(nao))
    dm0 = np.einsum("ij,kjl,ml->kim", U, dm0, U.conj())
    res_f = kghf_kernel(system, exxdiv="ewald", conv_tol=1e-11, dm0=dm0)
    res_i = kghf_kernel(system, exxdiv="ewald", conv_tol=1e-11, dm0=dm0,
                        df="isdf", isdf_c=12)
    assert res_i["converged"]
    # spin-rotation invariance: both match the collinear KUHF energy
    assert res_f["e_tot"] == pytest.approx(res_u["e_tot"], abs=1e-8)
    assert res_i["e_tot"] == pytest.approx(res_f["e_tot"], abs=5e-7)
    # the tilted moment survived (off-diagonal blocks were exercised)
    assert abs(res_i["spin"][0]) > 0.1


def test_frontend_kghf_density_fit():
    import pyscf_isdf_tpu as pit

    a = 6.0 * np.eye(3)
    cell = build_cell(a, [["H", (3.0, 3.0, 2.4)], ["H", (3.0, 3.0, 3.6)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[18] * 3)
    kpts = lattice.make_kpts(cell.a, [2, 1, 1], with_gamma_point=True)
    mf = pit.KGHF(cell, kpts).density_fit("isdf", c=12)
    e_i = mf.run()
    ref = pit.KGHF(cell, kpts)
    e_f = ref.run()
    assert mf.converged
    assert e_i == pytest.approx(e_f, abs=5e-7)
