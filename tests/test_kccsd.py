"""k-point CCSD == Gamma supercell CCSD (complex-orientation guard).

A 3x1x1 k-mesh has genuinely complex Bloch orbitals/ERIs while the
3x1x1 supercell at Gamma is real — agreement of the two CCSD (and (T))
correlation energies per cell validates every complex-Hermitian
integral orientation in cc/gccsd.py (the terms where the published
real-orbital tables silently use <ij||ab> = <ab||ij>). Reference
analog: pyscf/pbc/cc/kccsd.py supercell-consistency tests.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice, tools
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.cc import ccsd
from pyscf_isdf_tpu.cc.kccsd import kccsd


@pytest.fixture(scope="module")
def h2_chain():
    L = 6.0
    return build_cell(np.array([[2.8, 0, 0], [0, L, 0], [0, 0, L]]),
                      [["H", (0.0, L / 2, L / 2)],
                       ["H", (1.3, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade",
                      mesh=[8, 16, 16])


def test_kccsd_matches_supercell(h2_chain):
    cell = h2_chain
    kpts = lattice.make_kpts(cell.a, [3, 1, 1])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    kout = kccsd(ksys, kres, with_t=True, conv_tol=1e-10)
    assert kout["converged"]

    sc = tools.super_cell(cell, (3, 1, 1))
    ssys = build_scf_system(sc)
    sres = scf_kernel(ssys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    sout = ccsd(ssys, sres, with_t=True, conv_tol=1e-10)
    assert sout["converged"]

    assert abs(kres["e_tot"] - sres["e_tot"] / 3) < 5e-8
    assert abs(kout["e_corr"] - sout["e_corr"] / 3) < 5e-7
    assert abs(kout["e_t"] - sout["e_t"] / 3) < 1e-8
    # the k-point ERIs really are complex (the guard is not vacuous)
    from pyscf_isdf_tpu.cc.kccsd import build_composite_eris
    _, eri_so, _ = build_composite_eris(ksys, kres)
    assert np.abs(eri_so.imag).max() > 1e-4


def test_eom_kccsd_matches_supercell(h2_chain):
    """EOM-KCCSD: the determinant-space EOM on composite momentum-blocked
    integrals reproduces the Gamma-supercell EOM-EE spectrum (complex
    Bloch integrals vs real supercell — reference eom_kccsd_* physics)."""
    from pyscf_isdf_tpu.cc.kccsd import build_composite_eris, composite_h1so
    from pyscf_isdf_tpu.cc.kccsd import kccsd
    from pyscf_isdf_tpu.cc.eom import eom_ccsd
    from pyscf_isdf_tpu.cc import ccsd as ccsd_gamma
    from pyscf_isdf_tpu.cc.gccsd import spinorb_from_spatial
    from pyscf_isdf_tpu.df import fft_ao2mo
    import jax.numpy as jnp

    cell = h2_chain
    nkm = [2, 1, 1]
    kpts = lattice.make_kpts(cell.a, nkm)
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv=None, conv_tol=1e-12)
    kout = kccsd(ksys, kres, conv_tol=1e-11)
    f_so, eri_so, no_so = build_composite_eris(ksys, kres)
    h1so = composite_h1so(ksys, kres)
    w_k = eom_ccsd(h1so, eri_so, np.asarray(kout["t1"]),
                   np.asarray(kout["t2"]), no_so, sector="ee", nroots=5)

    sc = tools.super_cell(cell, tuple(nkm))
    ssys = build_scf_system(sc)
    sres = scf_kernel(ssys, xc=None, exxdiv=None, conv_tol=1e-12)
    sout = ccsd_gamma(ssys, sres, conv_tol=1e-11)
    mo_c = np.asarray(sres["mo_coeff"])
    nmo = mo_c.shape[1]
    h1mo = mo_c.T @ ssys.hcore @ mo_c
    moR = ssys.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(ssys.coulG), ssys.mesh,
        ssys.weight)).reshape(nmo, nmo, nmo, nmo)
    h1so_s, eri_so_s = spinorb_from_spatial(h1mo, eri_mo)
    w_s = eom_ccsd(h1so_s, eri_so_s, np.asarray(sout["t1"]),
                   np.asarray(sout["t2"]), ssys.nelec, sector="ee",
                   nroots=5)
    # excitation energies (differences) match across representations
    de_k = np.sort(w_k)[1:] - np.min(w_k)
    de_s = np.sort(w_s)[1:] - np.min(w_s)
    assert np.abs(de_k - de_s).max() < 5e-6


def test_jacobian_eom_kccsd(h2_chain):
    """Production-cost EOM on the composite k integrals: the Jacobian
    path works unchanged on momentum-blocked inputs (complex Hermitian);
    parity vs the Gamma-supercell Jacobian EOM excitations."""
    from pyscf_isdf_tpu.cc.kccsd import build_composite_eris, kccsd
    from pyscf_isdf_tpu.cc.eom import eom_ee_energies
    from pyscf_isdf_tpu.cc import ccsd as ccsd_gamma
    from pyscf_isdf_tpu.cc.gccsd import spinorb_from_spatial
    from pyscf_isdf_tpu.df import fft_ao2mo
    import jax.numpy as jnp

    cell = h2_chain
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv=None, conv_tol=1e-12)
    kout = kccsd(ksys, kres, conv_tol=1e-11)
    f_so, eri_so, no_so = build_composite_eris(ksys, kres)
    w_k = eom_ee_energies(f_so, eri_so, kout["t1"], kout["t2"], no_so,
                          nroots=4)

    sc = tools.super_cell(cell, (2, 1, 1))
    ssys = build_scf_system(sc)
    sres = scf_kernel(ssys, xc=None, exxdiv=None, conv_tol=1e-12)
    sout = ccsd_gamma(ssys, sres, conv_tol=1e-11)
    mo_c = np.asarray(sres["mo_coeff"])
    nmo = mo_c.shape[1]
    moR = ssys.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(ssys.coulG), ssys.mesh,
        ssys.weight)).reshape(nmo, nmo, nmo, nmo)
    _, eri_so_s = spinorb_from_spatial(
        np.diag(np.asarray(sres["mo_energy"])), eri_mo)
    f_so_s = np.diag(np.repeat(np.asarray(sres["mo_energy"]), 2))
    w_s = eom_ee_energies(f_so_s, eri_so_s, sout["t1"], sout["t2"],
                          ssys.nelec, nroots=4)
    assert np.abs(w_k[:3] - w_s[:3]).max() < 5e-6
