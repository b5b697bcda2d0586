"""k-point GGA (KRKS/PBE) consistency tests."""
import numpy as np
import pytest

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.tools import super_cell


def test_krks_pbe_gamma_matches_rks():
    cell = diamond_primitive(mesh=(15, 15, 15))
    res_r = scf_kernel(build_scf_system(cell), xc="pbe", conv_tol=1e-10)
    res_k = kscf_kernel(build_kscf_system(cell, np.zeros((1, 3))), xc="pbe",
                        conv_tol=1e-10)
    assert res_k["e_tot"] == pytest.approx(res_r["e_tot"], abs=1e-9)


def test_krks_pbe_supercell_equivalence():
    prim = diamond_primitive(mesh=(12, 12, 12))
    nrep = (2, 1, 1)
    kpts = lattice.make_kpts(prim.a, nrep)
    kres = kscf_kernel(build_kscf_system(prim, kpts), xc="pbe", conv_tol=1e-9)
    sres = scf_kernel(build_scf_system(super_cell(prim, nrep)), xc="pbe",
                      conv_tol=1e-9)
    assert sres["e_tot"] / np.prod(nrep) == pytest.approx(kres["e_tot"], abs=1e-6)
