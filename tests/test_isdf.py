"""ISDF J/K engine: parity against the FFTDF oracle and inside full SCF.

Contract (BASELINE.md): ISDF J/K must reproduce FFTDF J/K so that SCF
energies agree to <= 1e-6 Ha (here: far tighter, since n_IP exceeds the
AO-pair rank for these bases).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.df import isdf as isdf_mod


@pytest.fixture(scope="module")
def diamond():
    cell = diamond_primitive(mesh=(17, 17, 17))
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    return cell, system, res


def test_isdf_matches_fftdf_jk(diamond):
    cell, system, res = diamond
    dm = jnp.asarray(res["dm"])
    coulG = jnp.asarray(system.coulG)
    vk_ref = fftdf.get_k(system.aoR, dm, coulG, cell.mesh, cell.grid_weight)
    vj_ref = fftdf.get_j(system.aoR, dm, coulG, cell.mesh, cell.grid_weight)

    isdf = isdf_mod.build_isdf(system.aoR, coulG, cell.mesh, cell.grid_weight, c=8)
    vk = isdf_mod.get_k(isdf, dm)
    vj = isdf_mod.get_j(isdf, dm)
    assert np.abs(np.asarray(vk - vk_ref)).max() < 1e-9
    assert np.abs(np.asarray(vj - vj_ref)).max() < 1e-9


def test_isdf_cvt_selection(diamond):
    cell, system, res = diamond
    dm = jnp.asarray(res["dm"])
    coulG = jnp.asarray(system.coulG)
    rho = fftdf.get_rho(system.aoR, dm)
    coords = jnp.asarray(cell.uniform_grid())
    isdf = isdf_mod.build_isdf(
        system.aoR, coulG, cell.mesh, cell.grid_weight, c=10,
        method="cvt", coords=coords, rho=rho,
    )
    vk = isdf_mod.get_k(isdf, dm)
    vk_ref = fftdf.get_k(system.aoR, dm, coulG, cell.mesh, cell.grid_weight)
    # CVT points are not rank-revealing-optimal; looser bar
    assert np.abs(np.asarray(vk - vk_ref)).max() < 5e-3


def test_hf_scf_with_isdf_k(diamond):
    """Full HF SCF on diamond: ISDF K vs FFTDF K energies agree."""
    cell, system, _ = diamond
    coulG = jnp.asarray(system.coulG)
    res_ref = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)

    isdf = isdf_mod.build_isdf(system.aoR, coulG, cell.mesh, cell.grid_weight, c=8)

    def jk_isdf(dm, with_k):
        dmj = jnp.asarray(dm, dtype=system.aoR.dtype)
        vj = fftdf.get_j(system.aoR, dmj, coulG, system.mesh, system.weight)
        vk = isdf_mod.get_k(isdf, dmj) if with_k else None
        return vj, vk

    res = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10,
                     get_jk=jk_isdf)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(res_ref["e_tot"], abs=1e-8)


def test_pbe0_scf_with_isdf_k(diamond):
    """Hybrid DFT (PBE0): ISDF exchange inside the SCF."""
    cell, system, _ = diamond
    coulG = jnp.asarray(system.coulG)
    res_ref = scf_kernel(system, xc="pbe0", exxdiv="ewald", conv_tol=1e-10)

    isdf = isdf_mod.build_isdf(system.aoR, coulG, cell.mesh, cell.grid_weight, c=8)

    def jk_isdf(dm, with_k):
        dmj = jnp.asarray(dm, dtype=system.aoR.dtype)
        vj = fftdf.get_j(system.aoR, dmj, coulG, system.mesh, system.weight)
        vk = isdf_mod.get_k(isdf, dmj) if with_k else None
        return vj, vk

    res = scf_kernel(system, xc="pbe0", exxdiv="ewald", conv_tol=1e-10,
                     get_jk=jk_isdf)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(res_ref["e_tot"], abs=1e-8)


def test_isdf_atomic_selection(diamond):
    """Voronoi-partitioned (robust-fit) IP selection inside ISDF."""
    cell, system, res = diamond
    dm = jnp.asarray(res["dm"])
    coulG = jnp.asarray(system.coulG)
    isdf = isdf_mod.build_isdf(
        system.aoR, coulG, cell.mesh, cell.grid_weight, c=8,
        method="atomic", coords=jnp.asarray(cell.uniform_grid()),
        atom_coords=cell.coords,
    )
    vk = isdf_mod.get_k(isdf, dm)
    vk_ref = fftdf.get_k(system.aoR, dm, coulG, cell.mesh, cell.grid_weight)
    assert np.abs(np.asarray(vk - vk_ref)).max() < 1e-7


def test_isdf_blocked_selection(diamond):
    """Block-greedy pivot selection has greedy-quality K parity."""
    cell, system, res = diamond
    dm = jnp.asarray(res["dm"])
    coulG = jnp.asarray(system.coulG)
    isdf = isdf_mod.build_isdf(system.aoR, coulG, cell.mesh, cell.grid_weight,
                               c=8, method="cholesky-blocked")
    vk = isdf_mod.get_k(isdf, dm)
    vk_ref = fftdf.get_k(system.aoR, dm, coulG, cell.mesh, cell.grid_weight)
    assert np.abs(np.asarray(vk - vk_ref)).max() < 1e-8
