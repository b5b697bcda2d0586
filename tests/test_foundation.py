"""Foundation tests: lattice math, solid harmonics, basis normalization,
ewald energies (golden values from the reference test suite), analytic FT
consistency with real-space AO collocation."""
import numpy as np
import pytest

from pyscf_isdf_tpu import lattice, build_cell
from pyscf_isdf_tpu.basis import gth
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics
from pyscf_isdf_tpu.ops.ft_ao import ft_ao, overlap_and_kinetic


def test_gv_fft_ordering():
    a = np.diag([4.0, 5.0, 6.0])
    mesh = (4, 5, 6)
    Gv = lattice.get_Gv(a, mesh)
    assert Gv.shape == (120, 3)
    # first G is zero; second varies fastest along z
    assert np.allclose(Gv[0], 0)
    assert np.allclose(Gv[1], [0, 0, 2 * np.pi / 6.0])
    # fftfreq ordering: index n//2+ is negative frequency
    b = lattice.reciprocal_vectors(a)
    assert np.allclose(b @ a.T / (2 * np.pi), np.eye(3))


def test_uniform_grid_wrap_around():
    a = np.diag([4.0, 4.0, 4.0])
    mesh = (4, 4, 4)
    coords = lattice.uniform_grid(a, mesh)
    assert coords.shape == (64, 3)
    assert np.allclose(coords[0], 0)
    # wrap-around: second half of each axis is negative
    assert coords[:, 2].min() == pytest.approx(-2.0)


def test_cutoff_mesh_roundtrip():
    a = np.diag([10.0, 10.0, 10.0])
    mesh = lattice.cutoff_to_mesh(a, 50.0)
    assert np.all(mesh % 2 == 1)
    ke = lattice.mesh_to_cutoff(a, mesh)
    assert np.all(ke >= 50.0)


def test_solid_harmonics_orthonormal():
    # Gauss-Legendre x trapezoid quadrature over the sphere: the real
    # spherical harmonics (solid harmonics at |v|=1) must be orthonormal.
    nt, np_ = 64, 128
    xs, ws = np.polynomial.legendre.leggauss(nt)
    theta = np.arccos(xs)
    phi = np.arange(np_) * 2 * np.pi / np_
    T, P = np.meshgrid(theta, phi, indexing="ij")
    v = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], axis=-1
    ).reshape(-1, 3)
    w = np.repeat(ws, np_) * (2 * np.pi / np_)
    ys = [solid_harmonics(l, v, np) for l in range(5)]
    allY = np.concatenate(ys, axis=-1)  # (npts, 25)
    gram = np.einsum("pi,p,pj->ij", allY, w, allY)
    assert np.allclose(gram, np.eye(25), atol=1e-10)


def test_basis_normalization_self_overlap():
    # contracted normalized shells must have unit norm: verified by radial
    # quadrature of (sum_p c_p r^l e^{-a_p r^2})^2 r^2 dr == 1
    shells = gth.load_basis("gth-szv", "C")
    for (l, es, cs) in shells:
        r = np.linspace(1e-6, 30, 200001)
        for k in range(cs.shape[1]):
            rad = (cs[:, k][None, :] * np.exp(-es[None, :] * r[:, None] ** 2)).sum(1)
            rad *= r**l
            norm = np.trapezoid(rad**2 * r**2, r)
            assert norm == pytest.approx(1.0, abs=1e-8)


def test_pp_data_carbon():
    pp = gth.load_pseudo("gth-pade", "C")
    assert pp.zion == 4
    assert pp.rloc == pytest.approx(0.34883045)
    assert pp.cexp == pytest.approx((-8.5137711, 1.22843203))
    assert pp.proj_rl[0] == pytest.approx(0.30455321)
    assert pp.proj_h[0][0][0] == pytest.approx(9.52284179)


def test_ewald_golden_cubic():
    # reference golden value: pyscf/pbc/gto/test/test_cell.py:117-131
    cell = build_cell(
        np.diag([5.0, 5.0, 5.0]),
        [["He", (2, 2.5, 2.5)], ["He", (3, 2.5, 2.5)]],
        basis=[[0, (1.0, 1.0)]],
        mesh=[41] * 3,
    )
    assert coulomb.ewald(cell, 0.2, 30) == pytest.approx(-0.468640671931, abs=1e-9)
    assert coulomb.ewald(cell, 1.0, 30) == pytest.approx(-0.468640671931, abs=1e-9)


def test_ewald_golden_triclinic():
    # reference golden value: pyscf/pbc/gto/test/test_cell.py:133-146
    np.random.seed(10)
    a = np.random.random((3, 3)) * 2 + np.eye(3) * 2
    cell = build_cell(
        a,
        [["He", (1, 1, 2)], ["He", (3, 2, 1)]],
        basis=[[0, (1.0, 1.0)]],
        mesh=[41] * 3,
        unit="Angstrom",
    )
    for eta, cut in [(1, 20), (2, 10), (2, 5)]:
        assert coulomb.ewald(cell, eta, cut) == pytest.approx(
            -2.3711356723457615, abs=1e-9
        )


def _he2_cell(mesh=21):
    L = 4.0
    return build_cell(
        ((L, 0, 0), (0, L, 0), (0, 0, L)),
        [["He", (L / 2.0 - 0.5, L / 2.0, L / 2.0 - 0.5)],
         ["He", (L / 2.0, L / 2.0, L / 2.0 + 0.5)]],
        basis=[[0, (0.8, 1.0)], [0, (1.0, 1.0)], [0, (1.2, 1.0)]],
        mesh=[mesh] * 3,
    )


def test_ft_ao_vs_grid_fft():
    """fft(aoR) must equal (ngrids/vol) * analytic ft_ao on the same mesh."""
    import jax.numpy as jnp
    from pyscf_isdf_tpu.ops.ao_eval import PackedBasis, eval_ao

    cell = _he2_cell()
    coords = cell.uniform_grid()
    packed = PackedBasis.from_cell(cell)
    images = cell.lattice_images()
    aoR = np.asarray(eval_ao(packed, jnp.asarray(coords), jnp.asarray(images)))
    assert aoR.shape == (cell.ngrids, cell.nao)

    aoG_grid = np.fft.fftn(
        aoR.reshape(*cell.mesh, cell.nao), axes=(0, 1, 2)
    ).reshape(cell.ngrids, cell.nao)
    aoG_analytic = ft_ao(cell, cell.get_Gv()) * (cell.ngrids / cell.vol)
    assert np.abs(aoG_grid - aoG_analytic).max() < 1e-8 * np.abs(aoG_analytic).max()


def test_overlap_vs_grid_quadrature():
    cell = _he2_cell()
    S, T = overlap_and_kinetic(cell)
    # grid quadrature of aoR gives the same overlap (converged mesh)
    import jax.numpy as jnp
    from pyscf_isdf_tpu.ops.ao_eval import PackedBasis, eval_ao

    coords = cell.uniform_grid()
    packed = PackedBasis.from_cell(cell)
    aoR = np.asarray(eval_ao(packed, jnp.asarray(coords), jnp.asarray(cell.lattice_images())))
    S_grid = aoR.T @ aoR * cell.grid_weight
    assert np.abs(S - S_grid).max() < 1e-10
    # diagonal of S close to 1 apart from periodic-image overlap
    assert np.all(np.diag(S) > 0.9)
    # kinetic is symmetric positive
    assert np.allclose(T, T.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(T) > 0)


def test_native_ao_kernel_matches_numpy():
    """C/OpenMP host AO kernel == numpy evaluator (float64)."""
    from pyscf_isdf_tpu.ops import native
    from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy

    if not native.available():
        pytest.skip("no C compiler for the native kernel")
    cell = _he2_cell()
    a = eval_ao_numpy(cell, use_native=True)
    b = eval_ao_numpy(cell, use_native=False)
    assert np.abs(a - b).max() < 1e-12


def test_analytic_st_matches_gspace_quadrature():
    """Closed-form lattice-sum S/T == converged G-space quadrature
    (independent formulations; the analytic path is the default because
    its cost does not grow with basis steepness — all-electron cores)."""
    from pyscf_isdf_tpu.models import diamond_primitive
    from pyscf_isdf_tpu.ops.ft_ao import (overlap_and_kinetic,
                                          overlap_and_kinetic_analytic,
                                          converged_st_mesh)

    cell = diamond_primitive(mesh=(14, 14, 14))
    S0, T0 = overlap_and_kinetic(cell, mesh=converged_st_mesh(cell))
    S1, T1 = overlap_and_kinetic_analytic(cell)
    assert np.abs(S1 - S0).max() < 1e-12
    assert np.abs(T1 - T0).max() < 1e-11
    k = np.array([0.123, -0.272, 0.431])
    S0k, T0k = overlap_and_kinetic(cell, mesh=converged_st_mesh(cell), kpt=k)
    S1k, T1k = overlap_and_kinetic_analytic(cell, kpt=k)
    assert np.abs(S1k - S0k).max() < 1e-12
    assert np.abs(T1k - T0k).max() < 1e-11
