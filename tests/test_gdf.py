"""Gaussian density fitting (G-space build) vs the FFTDF oracle.

Reference component: pyscf/pbc/df/df.py GDF + gdf_builder (SURVEY §2.1).
The TPU redesign assembles j2c/j3c from grid-collocated, batch-FFT'd
functions (df/gdf.py) — the fitted ERI is the Coulomb-metric projection
of the FFTDF ERI, so errors shrink monotonically-ish with the
even-tempered progression ratio beta.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.df import gdf as gdf_mod, fft_ao2mo, fftdf


@pytest.fixture(scope="module")
def be_system():
    L = 7.0
    a = L * np.eye(3)
    a[1, 0] = 5.0
    cell = build_cell(a, [["Be", (L / 2, L / 2, L / 2)]], basis="gth-szv",
                      pseudo="gth-pade-q2", mesh=[12] * 3)
    return cell, build_scf_system(cell)


def test_eri_fit_converges(be_system):
    cell, system = be_system
    eri_fft = np.asarray(fft_ao2mo.get_eri(
        system.aoR, jnp.asarray(system.coulG), system.mesh, system.weight))
    errs = []
    for beta in (2.6, 1.6):
        g = gdf_mod.build_gdf(cell, system.aoR, jnp.asarray(system.coulG),
                              system.mesh, system.weight, beta=beta)
        errs.append(np.abs(gdf_mod.get_eri(g) - eri_fft).max())
    assert errs[0] < 5e-5
    assert errs[1] < errs[0]


def test_jk_parity(be_system):
    cell, system = be_system
    res = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    dm = jnp.asarray(res["dm"])
    g = gdf_mod.build_gdf(cell, system.aoR, jnp.asarray(system.coulG),
                          system.mesh, system.weight, beta=1.8)
    vj_g, vk_g = gdf_mod.get_jk(g, dm)
    vj_f = fftdf.get_j(system.aoR, dm, jnp.asarray(system.coulG),
                       system.mesh, system.weight)
    vk_f = fftdf.get_k(system.aoR, dm, jnp.asarray(system.coulG),
                       system.mesh, system.weight)
    assert np.abs(np.asarray(vj_g - vj_f)).max() < 5e-5
    assert np.abs(np.asarray(vk_g - vk_f)).max() < 5e-5


def test_scf_gdf_diamond():
    """p-shell system end-to-end: RHF diamond with df='gdf' lands within
    fitting accuracy of FFTDF and plugs into the standard driver."""
    cell = diamond_primitive(mesh=(14, 14, 14))
    system = build_scf_system(cell)
    r_fft = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    r_gdf = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10,
                       df="gdf")
    assert r_gdf["converged"]
    assert abs(r_gdf["e_tot"] - r_fft["e_tot"]) < 2e-4


def test_frontend_gdf():
    import pyscf_isdf_tpu as pit

    cell = diamond_primitive(mesh=(14, 14, 14))
    e_gdf = pit.RKS(cell, xc="lda,vwn").density_fit("gdf").run()
    e_fft = pit.RKS(cell, xc="lda,vwn").run()
    assert abs(e_gdf - e_fft) < 2e-4


def test_kpoint_gdf_jk_and_scf():
    """k-point GDF: J/K parity vs fftdf_k, and KRHF df='gdf' end-to-end
    (reference GDF's k-point _cderi builder, here G-space on device)."""
    import jax.numpy as jnp
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.df import fftdf_k

    L = 6.0
    cell = build_cell(np.array([[2.9, 0, 0], [0, L, 0], [0, 0, L]]),
                      [["H", (0.0, L / 2, L / 2)],
                       ["H", (1.25, L / 2 + 0.1, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[10, 14, 14])
    kpts = lattice.make_kpts(cell.a, [3, 1, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11)
    dm_k = jnp.stack([jnp.asarray(d) for d in res["dm"]])

    kg = gdf_mod.build_gdf_kpts(cell, system.aoR_k, kpts, system.mesh,
                                system.weight, beta=1.8)
    vj_g, vk_g = gdf_mod.get_jk_kpts(kg, dm_k)
    vj_f = fftdf_k.get_j_kpts(system.aoR_k, dm_k,
                              jnp.asarray(system.coulG), system.mesh,
                              system.weight)
    vk_f = fftdf_k.get_k_kpts(system.aoR_k, dm_k,
                              jnp.asarray(system.coulG_pairs),
                              jnp.asarray(system.expmikr), system.mesh,
                              system.weight / len(kpts))
    assert float(jnp.abs(vj_g - vj_f).max()) < 5e-5
    assert float(jnp.abs(vk_g - vk_f).max()) < 5e-5

    r_gdf = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-11,
                        df="gdf")
    assert r_gdf["converged"]
    assert abs(r_gdf["e_tot"] - res["e_tot"]) < 2e-5


def test_kpoint_gdf_phase_invariance():
    """The whitening eigenvectors of the complex q=0 j2c carry arbitrary
    per-column phases (and rotations inside degenerate eigenspaces);
    J/K must be invariant under them. Regression for a conjugation-
    placement bug caught by review: the unconjugated double-cd J
    contraction matched the oracle only for real-phase eigh output."""
    import jax.numpy as jnp
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel

    L = 6.0
    cell = build_cell(np.array([[2.9, 0, 0], [0, L, 0], [0, 0, L]]),
                      [["H", (0.0, L / 2, L / 2)],
                       ["H", (1.25, L / 2 + 0.1, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[10, 14, 14])
    kpts = lattice.make_kpts(cell.a, [3, 1, 1])
    system = build_kscf_system(cell, kpts)
    res = kscf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    dm_k = jnp.stack([jnp.asarray(d) for d in res["dm"]])
    kg = gdf_mod.build_gdf_kpts(cell, system.aoR_k, kpts, system.mesh,
                                system.weight, beta=1.8)
    vj, vk = gdf_mod.get_jk_kpts(kg, dm_k)
    # Hermiticity
    assert float(jnp.abs(vj - jnp.conj(jnp.swapaxes(vj, 1, 2))).max()) \
        < 1e-12
    # per-q-consistent random phase scramble of the whitened rows
    cd_new = []
    for k1 in range(kg.nk):
        row = []
        for k2 in range(kg.nk):
            c = np.asarray(kg.cd[k1][k2])
            q = tuple(np.round(kpts[k2] - kpts[k1], 10))
            rng = np.random.default_rng(abs(hash(q)) % 2**31)
            ph = np.exp(1j * rng.uniform(0, 2 * np.pi, c.shape[0]))
            row.append(jnp.asarray(ph[:, None, None] * c))
        cd_new.append(tuple(row))
    vj2, vk2 = gdf_mod.get_jk_kpts(
        gdf_mod.KGDF(cd=tuple(cd_new), nk=kg.nk), dm_k)
    assert float(jnp.abs(vj2 - vj).max()) < 1e-12
    assert float(jnp.abs(vk2 - vk).max()) < 1e-12
