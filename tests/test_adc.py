"""ADC(2) IP/EA: structural identities + EOM-CCSD proximity.

The spin-orbital non-Dyson strict-ADC(2) build (cc/adc.py) is pinned by
(1) the Koopmans limit (integrals off -> IP = -eps_i exactly), (2) the
fold identity fixing the coupling normalization against the textbook
second-order dynamic self-energy, and (3) proximity to the in-tree
EOM-CCSD ionization/attachment energies on a weakly correlated system
(a wrong sign or factor in any second-order block shifts the result by
~2x the correlation correction and fails loudly).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.cc import adc


@pytest.fixture(scope="module")
def h4():
    L = 8.0
    cell = build_cell(np.eye(3) * L,
                      [["H", (L / 2 - 1.8, L / 2, L / 2)],
                       ["H", (L / 2 - 0.6, L / 2, L / 2)],
                       ["H", (L / 2 + 0.7, L / 2, L / 2)],
                       ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[14] * 3)
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)
    return system, res


def test_koopmans_limit():
    rng = np.random.default_rng(0)
    eo = -np.sort(rng.uniform(0.3, 2.0, size=4))[::-1]
    ev = np.sort(rng.uniform(0.1, 1.5, size=6))
    V = np.zeros((10, 10, 10, 10))
    ips = adc.ip_adc2(eo, ev, V, nroots=4)
    assert np.abs(np.sort(ips) - np.sort(-eo)).max() < 1e-14
    eas = adc.ea_adc2(eo, ev, V, nroots=6)
    assert np.abs(np.sort(eas) - np.sort(ev)).max() < 1e-14


def test_fold_identity():
    """U (E - D)^-1 U^dag must equal the textbook 2h1p self-energy
    1/2 sum_kla <ia||kl><ja||kl>* / (E + eps_a - eps_k - eps_l)."""
    rng = np.random.default_rng(1)
    no, nv = 3, 4
    n = no + nv
    eo = -np.sort(rng.uniform(0.3, 2.0, size=no))[::-1]
    ev = np.sort(rng.uniform(0.1, 1.5, size=nv))
    V = rng.normal(size=(n, n, n, n))
    V = V - V.transpose(0, 1, 3, 2)
    V = V - V.transpose(1, 0, 2, 3)
    V = 0.5 * (V + V.transpose(2, 3, 0, 1))
    A = adc.ip_adc2_matrix(eo, ev, V)
    U = A[:no, no:]
    D = np.diag(A[no:, no:])
    E = -0.123
    fold = (U / (E - D)[None, :]) @ U.conj().T
    o, v = slice(0, no), slice(no, n)
    Viakl = V[o, v, o, o]
    den = (E + ev[None, :, None, None] - eo[None, None, :, None]
           - eo[None, None, None, :])
    sig = 0.5 * np.einsum("iakl,jakl->ij", Viakl / den, Viakl.conj())
    assert np.abs(fold - sig).max() < 1e-12


def test_adc2_vs_eomccsd_h4(h4):
    """IP/EA within the method-difference window of EOM-CCSD, both
    shifted from Koopmans in a consistent direction."""
    from pyscf_isdf_tpu.cc import ccsd as _ccsd
    from pyscf_isdf_tpu.cc.eom import eom_from_scf

    system, res = h4
    ips, eas = adc.adc2_from_scf(system, res, nroots=2)

    cc_out = _ccsd(system, res, conv_tol=1e-10)
    assert cc_out["converged"]
    # eom ip: E(N-1)-E(N) = +IP; ea: E(N+1)-E(N)
    eom_ip = eom_from_scf(system, res, cc_out, sector="ip", nroots=2)
    eom_ea = eom_from_scf(system, res, cc_out, sector="ea", nroots=2)

    ip_koop = -res["mo_energy"][system.nelec // 2 - 1]
    # both correlated IPs sit within 50 mHa of each other and differ
    # from Koopmans
    assert abs(ips[0] - eom_ip[0]) < 0.05
    assert abs(ips[0] - ip_koop) > 1e-3
    ea_koop = res["mo_energy"][system.nelec // 2]
    assert abs(eas[0] - eom_ea[0]) < 0.05
    assert abs(eas[0] - ea_koop) > 1e-4
