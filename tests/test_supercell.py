"""Supercell-vs-k-mesh physical equivalence (SURVEY.md section 4 pattern).

The Gamma-point energy of an n-fold supercell must equal (n x the) energy
of the primitive cell sampled on the corresponding k-mesh — a global
integration test of k-phases, coulG wrap-around, PP at k, and occupations
(reference analog: pyscf/pbc/dft/test/test_gamma_vs_ks.py).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.tools import super_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel


def test_gamma_supercell_vs_kmesh_lda():
    prim = diamond_primitive(mesh=(12, 12, 12))
    nrep = (2, 1, 1)

    kpts = lattice.make_kpts(prim.a, nrep)   # Gamma-centered 2x1x1
    ksys = build_kscf_system(prim, kpts)
    kres = kscf_kernel(ksys, xc="lda,vwn", conv_tol=1e-10)
    assert kres["converged"]

    sc = super_cell(prim, nrep)
    assert sc.natm == 4 and sc.nao == 16
    ssys = build_scf_system(sc)
    sres = scf_kernel(ssys, xc="lda,vwn", conv_tol=1e-10)
    assert sres["converged"]

    e_per_prim_sc = sres["e_tot"] / np.prod(nrep)
    assert e_per_prim_sc == pytest.approx(kres["e_tot"], abs=1e-6)
