"""GW on range-separated hybrids (HSE06) + spin k-GGA kugw v_mf.

Closes the VERDICT r3 Weak-#4 frontend walls (gw/rgw.py, gw/krgw.py,
gw/ugw.py RSH NotImplementedError sites; kugw spin k-GGA v_mf).

The primary oracle is the Fock identity: at SCF convergence the
mean-field potential diagnosed by the GW code must satisfy

    v_mf_mo[p] == mo_energy[p] - <p| hcore + vj |p>

orbital by orbital — every term the GW side assembles independently
(semilocal vxc, full-range exchange with madelung, LR erf exchange with
madelung_omega) is checked against the SCF's own converged Fock, so any
factor, sign, or probe-charge error fails loudly.  Reference contract:
pyscf/gw/gw_ac.py get_sigma (v_mf = veff - vj) + pbc/dft/rks.py:108-121
RSH K assembly.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.gw import rgw


@pytest.fixture(scope="module")
def hse_gamma():
    sys_ = build_scf_system(diamond_primitive(mesh=(14, 14, 14)))
    res = scf_kernel(sys_, xc="hse06", conv_tol=1e-11)
    assert res["converged"]
    return sys_, res


def _vj_hcore_mo(system, res):
    dm = jnp.asarray(res["dm"], system.aoR.dtype)
    vj = np.asarray(fftdf.get_j(system.aoR, dm, jnp.asarray(system.coulG),
                                system.mesh, system.weight), np.float64)
    C = np.asarray(res["mo_coeff"])
    return np.einsum("ip,ij,jp->p", C, system.hcore + vj, C)


def test_gw_hse06_vmf_fock_identity(hse_gamma):
    sys_, res = hse_gamma
    _, v_mf = rgw._mf_potentials(sys_, res, "hse06")
    want = np.asarray(res["mo_energy"]) - _vj_hcore_mo(sys_, res)
    assert np.abs(v_mf - want).max() < 5e-6


def test_gw_hse06_gamma_qp(hse_gamma):
    """GW@HSE06 runs end to end; QP gap is finite and close to GW@PBE0
    (same system, both starting points approximate the same QP)."""
    sys_, res = hse_gamma
    out = rgw.gw_ac_gamma(sys_, res, xc="hse06")
    assert out.converged
    assert np.isfinite(out.qp_energy).all()
    nocc = sys_.nelec // 2
    gap_hse = out.qp_energy[nocc] - out.qp_energy[nocc - 1]
    assert gap_hse > 0

    res0 = scf_kernel(sys_, xc="pbe0", conv_tol=1e-11)
    out0 = rgw.gw_ac_gamma(sys_, res0, xc="pbe0")
    gap_pbe0 = out0.qp_energy[nocc] - out0.qp_energy[nocc - 1]
    # starting-point dependence of G0W0 is small for an insulator
    assert abs(gap_hse - gap_pbe0) < 0.05


def test_ugw_hse06_closed_shell_limit(hse_gamma):
    """UGW@HSE06 on a closed shell == restricted GW@HSE06."""
    from pyscf_isdf_tpu.scf.uhf import uhf_kernel
    from pyscf_isdf_tpu.gw.ugw import ugw_ac_gamma

    sys_, res = hse_gamma
    out_r = rgw.gw_ac_gamma(sys_, res, xc="hse06")
    res_u = uhf_kernel(sys_, xc="hse06", conv_tol=1e-11)
    out_u = ugw_ac_gamma(sys_, res_u, xc="hse06")
    for s in range(2):
        assert np.abs(out_u.qp_energy[s] - out_r.qp_energy).max() < 1e-5


@pytest.mark.heavy
def test_kgw_hse06_vmf_fock_identity():
    """k-point Fock identity at HSE06 (2x1x1, off-Gamma mesh)."""
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.df import fftdf_k
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.gw import krgw

    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    sys_k = build_kscf_system(cell, kpts)
    res = kscf_kernel(sys_k, xc="hse06", conv_tol=1e-11)
    assert res["converged"]
    _, v_mf = krgw._mf_potentials_kpts(sys_k, res, "hse06")

    nk = len(sys_k.kpts)
    dm = jnp.asarray(res["dm"], sys_k.aoR_k.dtype)
    vj = np.asarray(fftdf_k.get_j_kpts(
        sys_k.aoR_k, dm, jnp.asarray(sys_k.coulG), sys_k.mesh,
        sys_k.weight), np.complex128)
    C = np.asarray(res["mo_coeff"])
    want = np.asarray(res["mo_energy"]) - np.einsum(
        "kip,kij,kjp->kp", C.conj(), sys_k.hcore + vj, C).real
    assert np.abs(v_mf - want).max() < 5e-6


@pytest.mark.heavy
def test_kugw_gga_closed_shell_limit():
    """kugw with a GGA (pbe) v_mf == restricted k-GW@PBE on a closed
    shell — exercises the vxc_spin_kpts GGA path end to end."""
    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel
    from pyscf_isdf_tpu.gw import krgw
    from pyscf_isdf_tpu.gw.ugw import kugw_ac

    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    sys_k = build_kscf_system(cell, kpts)
    res_r = kscf_kernel(sys_k, xc="pbe", conv_tol=1e-10)
    res_u = kuhf_kernel(sys_k, xc="pbe", conv_tol=1e-10)
    out_r = krgw.kgw_ac(sys_k, res_r, xc="pbe")
    out_u = kugw_ac(sys_k, res_u, xc="pbe")
    for s in range(2):
        assert np.abs(out_u.qp_energy[s] - out_r.qp_energy).max() < 1e-4
    assert out_u.converged
