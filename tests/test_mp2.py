"""Gamma-point MP2 + ISDF/THC-MP2 (BASELINE config 5).

Golden anchor: Be in a triclinic box (gth-szv, gth-pade-q2, mesh [12]^3),
pyscf/pbc/mp/test/test_kpoint.py:50-91 at a 1x1x1 k-mesh:
    escf = -1.2061049658473704,  emp2 = -5.44597932944397e-06 (9 dp).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.mp import mp2_energy, thc_mp2_energy
from pyscf_isdf_tpu.df import isdf as isdf_mod, fft_ao2mo


@pytest.fixture(scope="module")
def be_system():
    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2.0, L / 2.0, L / 2.0)]],
                      basis="gth-szv", pseudo="gth-pade-q2", mesh=[12] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-12)
    return system, res


def test_rhf_be_golden(be_system):
    system, res = be_system
    assert res["e_tot"] == pytest.approx(-1.2061049658473704, abs=1e-7)


def test_mp2_golden(be_system):
    system, res = be_system
    emp2 = mp2_energy(system, res)
    assert emp2 == pytest.approx(-5.44597932944397e-06, abs=1e-9)


def test_thc_mp2_matches_exact(be_system):
    system, res = be_system
    emp2 = mp2_energy(system, res)
    isdf = isdf_mod.build_isdf(system.aoR, jnp.asarray(system.coulG),
                               system.mesh, system.weight, c=10)
    ethc = thc_mp2_energy(isdf, res["mo_coeff"], res["mo_energy"],
                          nocc=system.nelec // 2)
    assert ethc == pytest.approx(emp2, abs=1e-11)


def test_eri_symmetry(be_system):
    """AO ERIs from the grid transform: 8-fold symmetric, positive diagonal."""
    system, _ = be_system
    nao = system.aoR.shape[1]
    eri = np.asarray(fft_ao2mo.get_eri(system.aoR, jnp.asarray(system.coulG),
                                       system.mesh, system.weight))
    eri4 = eri.reshape(nao, nao, nao, nao)
    assert np.allclose(eri4, eri4.transpose(1, 0, 2, 3), atol=1e-10)
    assert np.allclose(eri4, eri4.transpose(2, 3, 0, 1), atol=1e-10)
    # (ii|ii) Coulomb self-repulsion positive
    assert all(eri4[i, i, i, i] > 0 for i in range(nao))
