"""Exact-frequency-integration G0W0 oracle (dense dRPA diagonalization).

Reference contract: /root/reference/pyscf/gw/gw_exact.py — G0W0 with the
screened interaction W expanded over the *exact* direct-RPA excitation
spectrum (Lehmann representation), so the frequency integral is done
analytically.  O(N^6); used here purely as the first-principles oracle
the production GW-AC path (gw/rgw.py) is tested against, the same role
the reference's embedded slow implementations play (SURVEY §4).

Closed-shell spin-adapted dRPA:

    A = diag(d) + 2 K,   B = 2 K,   d_ia = e_a - e_i,
    K_ia,jb = (ia|jb)  [from the same whitened DF tensor as rgw.py,
                        so DF error cancels in parity tests]

Casida reduction (A - B is diagonal):  C = d^1/2 (d + 4K) d^1/2,
Omega_v^2 = eig(C); transition vectors (X+Y)_v = d^1/2 Z_v / sqrt(Omega_v)
normalized to (X+Y)^T d (X+Y) ... i.e. X^T X - Y^T Y = 1.

Self-energy (eta -> 0+):

    Sigma_p(w) = sum_v [ sum_i t_{v,ip}^2 / (w - (e_i - Omega_v) - i eta)
                       + sum_a t_{v,ap}^2 / (w - (e_a + Omega_v) + i eta) ]
    t_{v,qp} = sqrt(2) sum_ia (X+Y)_{v,ia} (ia|qp)

(the sqrt(2) is the closed-shell spin factor; gw_exact.py:74-84 carries
the same weight through pyscf's 1/2-normalized td_xy).
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu.gw.rgw import _mf_potentials, build_lmo


def drpa_diagonalize(mo_energy: np.ndarray, nocc: int, Lmo: np.ndarray):
    """Dense direct-RPA spectrum.

    Returns (omega, xpy, d, K):
        omega: (nov,) excitation energies
        xpy: (nov, nocc, nvir) X+Y with X^T X - Y^T Y = 1
        d: (nov,) orbital-energy differences e_a - e_i
        K: (nov, nov) (ia|jb)
    """
    mo_energy = np.asarray(mo_energy, dtype=np.float64)
    nmo = mo_energy.shape[0]
    nvir = nmo - nocc
    d = (mo_energy[None, nocc:] - mo_energy[:nocc, None]).reshape(-1)
    Lov = np.asarray(Lmo[:, :nocc, nocc:], dtype=np.float64).reshape(
        Lmo.shape[0], -1)
    K = Lov.T @ Lov                                   # (nov, nov)

    sd = np.sqrt(d)
    C = sd[:, None] * (np.diag(d) + 4.0 * K) * sd[None, :]
    w2, Z = np.linalg.eigh(C)
    omega = np.sqrt(np.maximum(w2, 0.0))
    xpy = (sd[:, None] * Z) / np.sqrt(omega)[None, :]   # (nov, nv_roots)
    return omega, xpy.T.reshape(-1, nocc, nvir), d, K


def exact_sigma(omega_p, mo_energy, nocc, omega, tdm, p, eta=1e-6,
                vir_sgn=1.0):
    """Sigma_p(omega_p) from the Lehmann sum (gw_exact.py:117-126)."""
    e = np.asarray(mo_energy, dtype=np.float64)
    t = tdm[:, :, p]                                  # (nexc, nmo)
    evi = omega[:, None] - e[None, :nocc]             # Omega_v - e_i
    eva = omega[:, None] + e[None, nocc:]             # Omega_v + e_a
    sig = np.sum(t[:, :nocc] ** 2 / (omega_p + evi - 1j * eta))
    sig += np.sum(t[:, nocc:] ** 2 / (omega_p - eva + vir_sgn * 1j * eta))
    return sig


def gw_exact_gamma(system, res, xc=None, orbs=None, eta=1e-6,
                   Lmo=None, linearized=False):
    """Exact-frequency G0W0 QP energies (oracle; dense, tiny systems).

    Same inputs/Fock conventions as gw_ac_gamma so the two paths are
    directly comparable orbital by orbital.
    """
    from scipy.optimize import newton

    mo_energy = np.asarray(res["mo_energy"], dtype=np.float64)
    nmo = mo_energy.shape[0]
    nocc = system.nelec // 2
    if orbs is None:
        orbs = np.arange(nmo)
    if Lmo is None:
        Lmo = build_lmo(system, res["mo_coeff"])
    Lmo_np = np.asarray(Lmo, dtype=np.float64)

    omega, xpy, d, K = drpa_diagonalize(mo_energy, nocc, Lmo_np)

    # t_{v,qp} = sqrt(2) sum_ia (X+Y)_{v,ia} (ia|qp)
    Lov = Lmo_np[:, :nocc, nocc:]
    rho_v = np.einsum("via,Pia->vP", xpy, Lov)          # (nexc, naux)
    tdm = np.sqrt(2.0) * np.einsum("vP,Ppq->vpq", rho_v, Lmo_np)

    vx_mo, v_mf_mo = _mf_potentials(system, res, xc)

    qp = mo_energy.copy()
    conv = True
    for p in orbs:
        def qp_eq(w, p=p):
            s = exact_sigma(w, mo_energy, nocc, omega, tdm, p, eta=eta)
            return w - mo_energy[p] - (s.real + vx_mo[p] - v_mf_mo[p])

        if linearized:
            de = 1e-6
            s0 = exact_sigma(mo_energy[p], mo_energy, nocc, omega, tdm,
                             p, eta=eta).real
            s1 = exact_sigma(mo_energy[p] + de, mo_energy, nocc, omega,
                             tdm, p, eta=eta).real
            z = 1.0 / (1.0 - (s1 - s0) / de)
            qp[p] = mo_energy[p] + z * (s0 + vx_mo[p] - v_mf_mo[p])
        else:
            try:
                qp[p] = newton(qp_eq, mo_energy[p], tol=1e-6, maxiter=100)
            except RuntimeError:
                conv = False
    return qp, conv


def rpa_ecorr_plasmon(mo_energy, nocc, Lmo) -> float:
    """Exact dRPA correlation energy by the plasmon formula
    Ec = 1/2 (sum_v Omega_v - tr A), A = diag(d) + 2K."""
    omega, _, d, K = drpa_diagonalize(mo_energy, nocc, np.asarray(Lmo))
    return float(0.5 * (np.sum(omega) - np.sum(d) - 2.0 * np.trace(K)))
