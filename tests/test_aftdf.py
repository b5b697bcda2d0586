"""AFTDF (analytic-FT) J/K engine vs the FFT collocation oracle.

Reference contract: pyscf/pbc/df/aft.py:566 + aft_jk.py — the two DF
flavors must agree on converged meshes (the reference's test_aft
cross-checks). Also validates ops/ft_ao.ft_aopair against a
first-principles grid FFT.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.df.aftdf import AFTDF
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.ops.ft_ao import ft_aopair
from pyscf_isdf_tpu.ops import coulomb


@pytest.fixture(scope="module")
def compact_cell():
    L = 5.0
    return build_cell(
        np.eye(3) * L,
        [["C", (1.0, 2.0, 2.4)], ["C", (3.1, 2.2, 2.0)]],
        basis=[[0, (2.0, 1.0)], [0, (0.9, 1.0)], [1, (1.1, 1.0)]],
        pseudo="gth-pade", mesh=[36] * 3,
    )


def test_ft_aopair_vs_grid(compact_cell):
    cell = compact_cell
    Gv = cell.get_Gv()
    pair = ft_aopair(cell, Gv)
    aoR = eval_ao_numpy(cell)
    nao = cell.nao
    mesh = cell.mesh
    rho = np.einsum("gi,gj->gij", aoR, aoR)
    rhoG = np.fft.fftn(rho.reshape(*mesh, nao, nao),
                       axes=(0, 1, 2)).reshape(-1, nao, nao) * cell.grid_weight
    assert np.abs(pair - rhoG).max() < 1e-9


def test_aftdf_jk_matches_fftdf(compact_cell):
    cell = compact_cell
    nao = cell.nao
    rng_dm = 2.0 / nao * np.eye(nao) + 0.01 * np.fromfunction(
        lambda i, j: np.cos(i + 2 * j) + np.cos(2 * i + j), (nao, nao))
    dm = 0.5 * (rng_dm + rng_dm.T)

    aft = AFTDF(cell)
    vj_a, vk_a = aft.get_jk(dm, exxdiv=None)

    aoR = jnp.asarray(eval_ao_numpy(cell))
    coulG = jnp.asarray(coulomb.get_coulG(cell))
    mesh3, w = tuple(cell.mesh), cell.grid_weight
    vj_f = np.asarray(fftdf.get_j(aoR, jnp.asarray(dm), coulG, mesh3, w))
    vk_f = np.asarray(fftdf.get_k(aoR, jnp.asarray(dm), coulG, mesh3, w))
    assert np.abs(vj_a - vj_f).max() < 1e-8
    assert np.abs(vk_a - vk_f).max() < 1e-8


def test_aftdf_ewald_g0_is_sds(compact_cell):
    """exxdiv='ewald' through the kernel's G=0 == the post-hoc madelung
    S D S shift (A(G=0) is the overlap matrix)."""
    cell = compact_cell
    nao = cell.nao
    dm = 2.0 / nao * np.eye(nao)
    aft = AFTDF(cell)
    _, vk0 = aft.get_jk(dm, with_j=False, exxdiv=None)
    _, vk1 = aft.get_jk(dm, with_j=False, exxdiv="ewald")
    S = np.asarray(aft.pair[0]).real
    mad = coulomb.madelung(cell)
    assert np.abs((vk1 - vk0) - mad * (S @ dm @ S)).max() < 1e-9


def test_aftdf_eri_matches_fft_ao2mo(compact_cell):
    cell = compact_cell
    aft = AFTDF(cell)
    eri_a = aft.get_eri()
    from pyscf_isdf_tpu.df import fft_ao2mo

    aoR = jnp.asarray(eval_ao_numpy(cell))
    coulG = jnp.asarray(coulomb.get_coulG(cell))
    eri_f = np.asarray(fft_ao2mo.get_eri(aoR, coulG, tuple(cell.mesh),
                                         cell.grid_weight))
    assert np.abs(eri_a - eri_f).max() < 1e-8
