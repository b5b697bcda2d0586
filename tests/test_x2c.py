"""sfX2C-1e: exact algebra oracles + atomic-block consistency.

The X2C algebra has a zero-free-parameter oracle: with V = W = 0 the
decoupled hcore must reproduce the free-particle relativistic dispersion
sqrt(c^4 + 2 t c^2) - c^2 on every kinetic eigenvector, and c -> inf
must restore T + V.  The one-center atomic engine is pinned against the
independent lattice-summed MD integrals on an isolated atom (exact
agreement), and the Si 1s scalar-relativistic lowering anchors the
physics (hydrogenic estimate ~ -0.2 Ha).
"""
import numpy as np
import pytest
import scipy.linalg

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu.ops import md_int
from pyscf_isdf_tpu.scf import x2c


def test_free_particle_dispersion():
    rng = np.random.default_rng(0)
    n = 8
    A = rng.normal(size=(n, n))
    s = A @ A.T + n * np.eye(n)
    B = rng.normal(size=(n, n))
    t = B @ B.T * 5.0
    z = np.zeros((n, n))
    c = x2c.LIGHT_SPEED
    X = x2c.x2c1e_xmatrix(t, z, z, s, c)
    h = x2c.get_hcore_fw(t, z, z, s, X, c)
    tv = scipy.linalg.eigh(t, s, eigvals_only=True)
    disp = np.sqrt(c ** 4 + 2.0 * tv * c * c) - c * c
    ev = scipy.linalg.eigh(h, s, eigvals_only=True)
    assert np.abs(np.sort(ev) - np.sort(disp)).max() < 1e-10


def test_nonrelativistic_limit():
    rng = np.random.default_rng(1)
    n = 6
    A = rng.normal(size=(n, n))
    s = A @ A.T + n * np.eye(n)
    B = rng.normal(size=(n, n))
    t = B @ B.T * 3.0
    v = rng.normal(size=(n, n))
    v = 0.5 * (v + v.T)
    w = B @ B.T
    c = 1e6
    X = x2c.x2c1e_xmatrix(t, v, w, s, c)
    h = x2c.get_hcore_fw(t, v, w, s, X, c)
    assert np.abs(h - (t + v)).max() < 1e-7


def test_atomic_blocks_vs_lattice():
    """Isolated atom: the one-center engine must equal the independent
    lattice-summed MD integrals exactly (single image survives)."""
    cell = build_cell(np.eye(3) * 200.0, [["He", (100.0,) * 3]],
                      "sto-3g", mesh=(4, 4, 4), dimension=0)
    s1, t1, v1, w1 = x2c.atomic_blocks(cell, 0)
    assert np.abs(s1 - md_int.overlap(cell)).max() < 1e-14
    assert np.abs(t1 - md_int.kinetic(cell)).max() < 1e-14
    assert np.abs(v1 - md_int.vne(cell, None)).max() < 1e-13
    assert np.abs(w1 - w1.T).max() < 1e-12       # pVp symmetric


def test_si_1s_relativistic_lowering():
    si = build_cell(np.eye(3) * 200.0, [["Si", (100.0,) * 3]], "sto-3g",
                    mesh=(4, 4, 4), dimension=0)
    s1, t1, v1, w1 = x2c.atomic_blocks(si, 0)
    e_nr = scipy.linalg.eigh(t1 + v1, s1, eigvals_only=True)
    X = x2c.x2c1e_xmatrix(t1, v1, w1, s1)
    h = x2c.get_hcore_fw(t1, v1, w1, s1, X)
    e_r = scipy.linalg.eigh(h, s1, eigvals_only=True)
    shift = e_r[0] - e_nr[0]
    assert -0.35 < shift < -0.08       # hydrogenic-scale 1s lowering


def test_md_kinetic_vs_ft():
    """Lattice-summed MD kinetic == the analytic-FT path on a smooth
    (GTH) cell where the G-mesh converges."""
    from pyscf_isdf_tpu.models import diamond_primitive
    from pyscf_isdf_tpu.ops.ft_ao import overlap_and_kinetic_analytic

    cell = diamond_primitive(mesh=(20, 20, 20), basis="gth-dzvp")
    _, T_ft = overlap_and_kinetic_analytic(cell)
    T_md = md_int.kinetic(cell)
    assert np.abs(T_md - np.asarray(T_ft)).max() < 1e-8


@pytest.mark.slow
def test_sfx2c1e_he_solid():
    """End-to-end PBC sfX2C hcore on an all-electron He solid: the
    relativistic correction is small, attractive for the core-dominated
    lowest band, and the c->inf driver limit matches ae_hcore."""
    from pyscf_isdf_tpu.df.aegdf import ae_hcore

    cell = build_cell(np.eye(3) * 6.0, [["He", (0.0, 0.0, 0.0)]],
                      "sto-3g", ke_cutoff=600.0)
    S, h_nr = ae_hcore(cell, 0.4)
    S2, h_x2c = x2c.sfx2c1e_hcore(cell, 0.4)
    assert np.abs(S - S2).max() < 1e-12
    e_nr = scipy.linalg.eigh(h_nr, S, eigvals_only=True)
    e_r = scipy.linalg.eigh(h_x2c, S, eigvals_only=True)
    shift = e_r[0] - e_nr[0]
    assert -1e-2 < shift < -1e-5       # He: small, negative
    _, h_inf = x2c.sfx2c1e_hcore(cell, 0.4, c=1e7)
    assert np.abs(h_inf - h_nr).max() < 1e-6
