"""All-electron GDF (df/aegdf.py) — the mesh-free deep-core path
(VERDICT r2 next #5; reference analytic-GDF pyscf/pbc/df/df.py:127).

Validation strategy (no external integral library exists in-tree, so
every check is an independent-path identity):

  1. molecular mode (0-dim, omega=None): density-fitted RHF reproduces
     the EXACT-integral RHF (ops/md_int.int2e_molecular) to the aux-fit
     residual — validates j2c/j3c assembly + whitening;
  2. omega-independence (PBC): the erfc/erf split is exact, so total
     energies at two distant omegas must agree — the sharpest internal
     check of the SR real-space sums, the LR G-sphere sums AND the
     analytic G=0 subtractions (any error in any piece is
     omega-dependent);
  3. duality vs the grid engine: all-electron He solid is smooth enough
     for FFTDF to converge (BECKE_GRIDS.md), so the two INDEPENDENT
     engines (analytic RS-GDF vs grid collocation) must produce the
     same HF total energy;
  4. (slow) all-electron Si diamond HF — the case the mesh engines
     CANNOT reach (Si 1s exponent ~407 needs ke ~ 30 kHa): certified by
     omega-independence at full production settings.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu.df import aegdf
from pyscf_isdf_tpu.ops import md_int


def _water():
    R = np.array([[0.0, 0.0, -0.143225816552],
                  [0.0, 1.638036840407, 1.136548822547],
                  [0.0, -1.638036840407, 1.136548822547]])
    return build_cell(np.eye(3) * 200.0,
                      [["O", tuple(R[0])], ["H", tuple(R[1])],
                       ["H", tuple(R[2])]],
                      "sto-3g", mesh=(4, 4, 4), dimension=0)


def test_molecular_fit_vs_exact():
    mol = _water()
    res = aegdf.aehf_kernel(mol, omega=None)
    assert res["converged"]
    # exact-integral RHF (anchored at -74.942079928192 in test_md_int)
    assert abs(res["e_tot"] - (-74.942079928192)) < 1e-3
    # fit residual should be small but nonzero (sanity that the fitted
    # path, not the exact path, ran)
    assert abs(res["e_tot"] - (-74.942079928192)) > 1e-9


def _he_solid(mesh=None):
    # simple-cubic all-electron He, a = 6 bohr
    return build_cell(np.eye(3) * 6.0, [["He", (0.0, 0.0, 0.0)]],
                      "sto-3g", mesh=mesh, ke_cutoff=None if mesh else 600.0)


def test_omega_independence_pbc():
    cell = _he_solid(mesh=(8, 8, 8))   # mesh unused by the analytic path
    e1 = aegdf.aehf_kernel(cell, omega=0.3)["e_tot"]
    e2 = aegdf.aehf_kernel(cell, omega=0.6)["e_tot"]
    assert abs(e1 - e2) < 1e-6


def test_he_solid_vs_fftdf():
    """Analytic RS-GDF vs grid FFTDF on the all-electron He solid —
    two fully independent engines, same HF convention (exxdiv=ewald)."""
    import jax.numpy as jnp
    from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel

    cell = _he_solid()                 # ke_cutoff=600 -> converged mesh
    res_grid = scf_kernel(build_scf_system(cell), xc=None,
                          conv_tol=1e-10)
    assert res_grid["converged"]
    res_ae = aegdf.aehf_kernel(cell, omega=0.4)
    assert res_ae["converged"]
    # mesh collocation error at ke=600 for He ~ 1e-5; fit error ~ 1e-5
    assert abs(res_ae["e_tot"] - res_grid["e_tot"]) < 1e-4


@pytest.mark.slow
def test_si_diamond_all_electron():
    """THE capability gap (BECKE_GRIDS.md: Si all-electron does NOT
    converge on practical meshes; reference warns FFTDF off at
    pyscf/pbc/df/fft.py:221-227). Certified by omega-independence."""
    a = 10.26
    lat = 0.5 * a * (np.ones((3, 3)) - np.eye(3))
    cell = build_cell(lat, [["Si", (0.0, 0.0, 0.0)],
                            ["Si", (a / 4, a / 4, a / 4)]],
                      "sto-3g", mesh=(8, 8, 8))   # mesh unused
    e1 = aegdf.aehf_kernel(cell, omega=0.3)["e_tot"]
    e2 = aegdf.aehf_kernel(cell, omega=0.5)["e_tot"]
    # internal convergence: two distant splits agree below 1 mHa
    assert abs(e1 - e2) < 1e-3
    # sanity: near two Si atoms' HF energy scale (~ -2 x 288 Ha)
    assert -600.0 < e1 < -500.0
