"""B88/LYP functional family (BLYP, B3LYP, B3LYP5).

No libxc exists in-tree to oracle against, so the validation is
(a) exact internal invariants — spin-resolved == restricted at
    rho_a == rho_b, B88 -> Slater as grad rho -> 0, Vxc == dExc/dD by
    construction (autodiff) exercised through the SCF;
(b) physical anchors — B88 approximates exact exchange to ~1% for He
    (Becke PRA 38, 3098 (1988) Table I), LYP gives E_c(He) ~= -0.0437
    (Lee-Yang-Parr PRB 37, 785 (1988));
(c) end-to-end SCF sanity (RKS/UKS/hybrid driver paths).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.ops.xc import XCSpec, _ex_b88, _ex_slater, _ec_lyp
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel


def test_spin_restricted_consistency():
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.05, 2.0, 64))
    sigma = jnp.asarray(rng.uniform(0.0, 4.0, 64))
    for name in ("blyp", "b3lyp", "b3lyp5"):
        spec = XCSpec(name)
        exc_r, _, _ = spec.exc_vxc(rho, sigma)
        exc_s, _, _ = spec.exc_vxc_spin(0.5 * rho, 0.5 * rho,
                                        0.25 * sigma, 0.25 * sigma,
                                        0.25 * sigma)
        assert float(jnp.abs(exc_r - exc_s).max()) < 1e-10, name


def test_b88_slater_limit():
    rho = jnp.asarray(np.linspace(0.05, 3.0, 32))
    ex = _ex_b88(rho, jnp.zeros_like(rho) + 1e-30)
    assert float(jnp.abs(ex - _ex_slater(rho)).max()) < 1e-8


@pytest.fixture(scope="module")
def he_hf():
    L = 7.0
    cell = build_cell(np.eye(3) * L, [["He", (L / 2, L / 2, L / 2)]],
                      basis="sto-6g", pseudo=None, mesh=[64] * 3,
                      dimension=0)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-11)
    assert res["converged"]
    return system, res


def test_he_anchors(he_hf):
    """B88 ~ exact exchange within ~1.5%; LYP E_c near the paper's He
    value (basis/grid-limited window)."""
    from pyscf_isdf_tpu.df import fftdf
    from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft

    system, res = he_hf
    dm = jnp.asarray(res["dm"])
    aoR = system.aoR
    # exact exchange energy of the converged density
    vk = fftdf.get_k(aoR, dm, jnp.asarray(system.coulG), system.mesh,
                     system.weight)
    e_x_hf = -0.25 * float(jnp.einsum("ij,ji->", dm, vk))
    # B88 on the same density
    t = aoR @ dm
    rho = jnp.sum(t * aoR, axis=-1)
    Gv = jnp.asarray(system.Gv)
    ao_grad = ao_gradient_fft(aoR, system.mesh, Gv)
    grho = 2.0 * jnp.einsum("gi,xgi->xg", t, ao_grad)
    sigma = jnp.sum(grho * grho, axis=0)
    e_x_b88 = system.weight * float(jnp.sum(rho * _ex_b88(rho, sigma)))
    assert abs(e_x_b88 - e_x_hf) / abs(e_x_hf) < 0.02
    e_c_lyp = system.weight * float(jnp.sum(rho * _ec_lyp(rho, sigma)))
    assert -0.055 < e_c_lyp < -0.035


def test_blyp_b3lyp_scf():
    """End-to-end RKS BLYP + hybrid B3LYP on H2 (pure-GGA and hybrid
    driver paths); B3LYP between BLYP and HF-ish energies."""
    L = 7.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    e = {}
    for xc in ("blyp", "b3lyp", "pbe"):
        r = scf_kernel(system, xc=xc, exxdiv="ewald", conv_tol=1e-10)
        assert r["converged"], xc
        e[xc] = r["e_tot"]
    # same chemistry, same ballpark
    assert abs(e["blyp"] - e["pbe"]) < 0.05
    assert abs(e["b3lyp"] - e["blyp"]) < 0.05


def test_uks_blyp_restricted_limit():
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel

    L = 7.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    r_r = scf_kernel(system, xc="blyp", exxdiv="ewald", conv_tol=1e-10)
    r_u = uhf_kernel(system, xc="blyp", exxdiv="ewald", conv_tol=1e-10)
    assert abs(r_r["e_tot"] - r_u["e_tot"]) < 1e-7
