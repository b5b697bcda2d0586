"""k->Gamma unfolding (reference analog: pyscf/pbc/tools/k2gamma.py)."""
import numpy as np
import pytest

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.tools import super_cell
from pyscf_isdf_tpu.k2gamma import dm_k2gamma, mo_k2gamma, get_phase
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel


def test_dm_unfold_restart():
    """Unfolded k-density restarts the supercell SCF at its solution."""
    prim = diamond_primitive(mesh=(12, 12, 12))
    nrep = (2, 1, 1)
    kpts = lattice.make_kpts(prim.a, nrep)
    ksys = build_kscf_system(prim, kpts)
    kres = kscf_kernel(ksys, xc="lda,vwn", conv_tol=1e-10)

    D_sc = dm_k2gamma(prim, kres["dm"], kpts, nrep)
    sc = super_cell(prim, nrep)
    ssys = build_scf_system(sc)
    # electron count survives unfolding
    ne = np.einsum("ij,ji->", np.asarray(D_sc).real, ssys.S)
    assert ne == pytest.approx(sc.nelectron, abs=1e-6)

    res = scf_kernel(ssys, xc="lda,vwn", conv_tol=1e-10, dm0=D_sc)
    assert res["niter"] <= 6
    assert res["e_tot"] / np.prod(nrep) == pytest.approx(kres["e_tot"], abs=1e-5)


def test_mo_unfold_orthonormal():
    """Unfolded MOs are orthonormal in the supercell overlap metric."""
    prim = diamond_primitive(mesh=(12, 12, 12))
    nrep = (2, 1, 1)
    kpts = lattice.make_kpts(prim.a, nrep)
    ksys = build_kscf_system(prim, kpts)
    kres = kscf_kernel(ksys, xc="lda,vwn", conv_tol=1e-9)

    C = mo_k2gamma(prim, kres["mo_coeff"], kpts, nrep)
    sc = super_cell(prim, nrep)
    ssys = build_scf_system(sc)
    gram = C.conj().T @ ssys.S @ C
    assert np.abs(gram - np.eye(gram.shape[0])).max() < 1e-6
