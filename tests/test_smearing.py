"""Smeared-occupation parity against reference golden entropies.

Golden values: pyscf/pbc/scf/test/test_addons.py:53-67 — synthetic k-point
spectrum mo_e[k, i] = 0.2 i + 0.1 cos(k + 0.5), nao=4, nk=2, 8 electrons
in the k-supercell:
  fermi entropy  = 6.1656394960533021 / 2
  gauss  entropy = 0.94924016074521311 / 2
"""
import numpy as np
import pytest

from pyscf_isdf_tpu.scf.occupations import smearing_occ_rhf


@pytest.fixture
def mo_e_k():
    nao, nk = 4, 2
    return [np.arange(nao) * 0.2 + np.cos(i + 0.5) * 0.1 for i in range(nk)]


def test_fermi_entropy_golden(mo_e_k):
    occ, entropy, mu = smearing_occ_rhf(mo_e_k, nelec_tot=8, sigma=0.1,
                                        method="fermi")
    assert sum(o.sum() for o in occ) == pytest.approx(8.0, abs=1e-8)
    assert entropy == pytest.approx(6.1656394960533021 / 2, abs=1e-7)


def test_gauss_entropy_golden(mo_e_k):
    occ, entropy, mu = smearing_occ_rhf(mo_e_k, nelec_tot=8, sigma=0.1,
                                        method="gauss")
    assert sum(o.sum() for o in occ) == pytest.approx(8.0, abs=1e-8)
    assert entropy == pytest.approx(0.94924016074521311 / 2, abs=1e-7)


def test_smeared_scf_runs():
    """Smearing inside the k-SCF: converges and reports entropy/free energy."""
    from pyscf_isdf_tpu import build_cell, lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    cell = build_cell(
        np.eye(3) * 3, "He 0 0 0; He 1 0 1",
        basis=[[0, (1.0, 1.0)], [0, (0.5, 1.0)]],
        mesh=[10] * 3, unit="Angstrom",
    )
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-9,
                      sigma=0.1, smearing_method="fermi")
    assert res["converged"]
    assert res["entropy"] >= 0
    assert res["e_free"] <= res["e_tot"] + 1e-12
