"""d-function (l=2) coverage: gth-dzvp carbon in both AO paths.

The real-space lattice-sum evaluator and the analytic G-space FT are
independent implementations of the same AOs — agreement at l=2 pins the
d-shell solid harmonics, normalization and FT phase conventions.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.ops.ft_ao import ft_ao, overlap_and_kinetic
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel


@pytest.fixture(scope="module")
def dzvp_cell():
    return diamond_primitive(mesh=(20, 20, 20), basis="gth-dzvp")


def test_dzvp_ft_vs_grid():
    # mesh fine enough that grid-FFT aliasing of the tightest primitive
    # (a=4.34) is below the comparison bar
    cell = diamond_primitive(mesh=(36, 36, 36), basis="gth-dzvp")
    assert cell.nao == 26  # 2 C x (2s + 2p + d) = 2 x 13
    aoR = eval_ao_numpy(cell)
    aoG_grid = np.fft.fftn(
        aoR.reshape(*cell.mesh, cell.nao), axes=(0, 1, 2)
    ).reshape(cell.ngrids, cell.nao)
    aoG_analytic = ft_ao(cell, cell.get_Gv()) * (cell.ngrids / cell.vol)
    scale = np.abs(aoG_analytic).max()
    assert np.abs(aoG_grid - aoG_analytic).max() < 1e-6 * scale


def test_dzvp_scf_runs(dzvp_cell):
    system = build_scf_system(dzvp_cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    assert res["converged"]
    # dzvp must lower the energy vs szv (variational)
    szv = diamond_primitive(mesh=(20, 20, 20))
    res_szv = scf_kernel(build_scf_system(szv), xc="lda,vwn", conv_tol=1e-9)
    assert res["e_tot"] < res_szv["e_tot"]
