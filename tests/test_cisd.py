"""CISD: variational bracket vs HF/CCSD/FCI, exactness for 2 electrons.

Reference capability parity: pyscf/pbc/ci/cisd.py routes a Gamma PBC
mean field into molecular CISD; here the determinant-space build
(cc/cisd.py) is pinned by exact structural identities instead of golden
numbers.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.cc import cisd, cisd_ground_state, fci_ground_state
from pyscf_isdf_tpu.cc import gccsd
from pyscf_isdf_tpu.df import fft_ao2mo


def _so_ints(system, res):
    mo_c = np.asarray(res["mo_coeff"])
    nmo = mo_c.shape[1]
    h1mo = mo_c.T @ system.hcore @ mo_c
    moR = system.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(system.coulG), system.mesh,
        system.weight)).reshape(nmo, nmo, nmo, nmo)
    return gccsd.spinorb_from_spatial(h1mo, eri_mo)


@pytest.fixture(scope="module")
def h4():
    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    return system, res


def test_cisd_two_electrons_is_fci(h4):
    """For 2 electrons CISD spans the full space: == FCI exactly."""
    system, res = h4
    h1so, eri_so = _so_ints(system, res)
    (e_cisd,), _ = cisd_ground_state(h1so, eri_so, 2)
    (e_fci,), _ = fci_ground_state(h1so, eri_so, 2)
    assert abs(e_cisd - e_fci) < 1e-12


def test_cisd_variational_bracket(h4):
    """E_HF > E_CISD >= E_FCI, and CISD recovers most of the FCI
    correlation for H4 (4 electrons: quadruples missing)."""
    system, res = h4
    e_corr, e_tot = cisd(system, res)
    assert e_corr < -1e-3                       # real correlation

    h1so, eri_so = _so_ints(system, res)
    (e_fci,), _ = fci_ground_state(h1so, eri_so, system.nelec)
    e_fci_tot = e_fci + system.e_nuc
    assert e_tot >= e_fci_tot - 1e-10           # variational bound
    assert e_tot < res["e_tot"]                 # below HF
    # captures most of the correlation energy
    assert (e_tot - res["e_tot"]) / (e_fci_tot - res["e_tot"]) > 0.9
