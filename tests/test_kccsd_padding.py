"""Occupation padding for the production k-CCSD tiers (VERDICT r4 #3).

Non-uniform per-k occupation (doped/metallic integer fills, shifted
meshes) previously fell back to the composite oracle; the blocked tier
now pads every k to the maximal occupied/virtual widths with zero MO
columns at sentinel energies — the reference's ``_padding_k_idx``
machinery (pyscf/pbc/mp/kmp2.py:228, consumed by
pyscf/pbc/cc/kccsd_rhf.py), already used by this repo's KMP2
(mp/kmp2._pad_spaces).

Test construction: a converged H2-chain KRHF at 2 k-points, then a
RIGID-BAND DOPED determinant (one extra pair in the conduction minimum
at X — non-degenerate, so every occupied level stays below every
virtual and the CC iteration is well-posed). Both tiers consume the
same scf_res, so blocked == composite is an exact parity oracle for
the padding — the VERDICT criterion is 1e-7 on e_corr.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel


@pytest.fixture(scope="module")
def h2_chain():
    a = np.diag([4.4, 12.0, 12.0])
    cell = build_cell(a, [["H", (0.0, 0.0, 0.0)], ["H", (2.2, 0.0, 0.0)]],
                      "gth-szv", pseudo="gth-pade", mesh=(12, 10, 10))
    kpts = lattice.make_kpts(cell.a, [2, 1, 1])
    ksys = build_kscf_system(cell, kpts)
    res = kscf_kernel(ksys, conv_tol=1e-10)
    assert res["converged"]
    return ksys, res


def _doped(res):
    """Rigid-band doped reference: +2 electrons in the conduction
    minimum (the k with the lowest unoccupied level) -> non-uniform
    per-k nocc with aufbau-consistent denominators."""
    occ = np.array(res["mo_occ"], copy=True)
    mo_e = np.asarray(res["mo_energy"])
    lumo_k = int(np.argmin([mo_e[k][occ[k] < 0.5].min()
                            for k in range(len(occ))]))
    lumo_i = int(np.where(occ[lumo_k] < 0.5)[0][0])
    occ[lumo_k, lumo_i] = 2.0
    out = dict(res)
    out["mo_occ"] = occ
    noccs = (occ > 0.5).sum(axis=1)
    assert len(set(noccs.tolist())) > 1, "construction must be non-uniform"
    return out


def test_blocked_matches_composite_nonuniform(h2_chain):
    from pyscf_isdf_tpu.cc.kccsd import kccsd
    from pyscf_isdf_tpu.cc.kccsd_blocked import kccsd_blocked

    ksys, res = h2_chain
    doped = _doped(res)
    out_c = kccsd(ksys, doped, conv_tol=1e-11)
    out_b = kccsd_blocked(ksys, doped, conv_tol=1e-11)
    assert out_c["converged"] and out_b["converged"]
    assert abs(out_b["e_corr"] - out_c["e_corr"]) < 1e-7
    # and the padded result is a genuine correlation energy
    assert out_b["e_corr"] < -1e-4


def test_blocked_padding_uniform_noop(h2_chain):
    """With uniform occupation the padded builder must reduce exactly
    to the former permutation path (no padding columns)."""
    from pyscf_isdf_tpu.cc.kccsd import kccsd
    from pyscf_isdf_tpu.cc.kccsd_blocked import kccsd_blocked

    ksys, res = h2_chain
    out_c = kccsd(ksys, res, conv_tol=1e-11)
    out_b = kccsd_blocked(ksys, res, conv_tol=1e-11)
    assert abs(out_b["e_corr"] - out_c["e_corr"]) < 1e-9


def test_kuccsd_nonuniform_per_spin(h2_chain):
    """Open-shell tiers: blocked KUCCSD (per-spin padding) == composite
    KUCCSD (global occupied-first flattening) on a spin- AND k-
    non-uniform doped determinant; and both == the restricted result
    when the spin channels are identical."""
    from pyscf_isdf_tpu.cc.kccsd import kccsd, kuccsd
    from pyscf_isdf_tpu.cc.kccsd_blocked import (kccsd_blocked,
                                                 kuccsd_blocked)

    ksys, res = h2_chain
    doped = _doped(res)
    occ = np.asarray(doped["mo_occ"])
    mo_c = [np.asarray(c) for c in doped["mo_coeff"]]
    mo_e = np.asarray(doped["mo_energy"])
    # identical alpha/beta channels carrying the non-uniform fill
    res_u = dict(doped)
    res_u["mo_coeff"] = (mo_c, mo_c)
    res_u["mo_energy"] = (mo_e, mo_e)
    res_u["mo_occ"] = (occ / 2.0, occ / 2.0)

    out_u = kuccsd(ksys, res_u, conv_tol=1e-11)
    out_ub = kuccsd_blocked(ksys, res_u, conv_tol=1e-11)
    out_r = kccsd_blocked(ksys, doped, conv_tol=1e-11)
    assert abs(out_u["e_corr"] - out_r["e_corr"]) < 1e-7
    assert abs(out_ub["e_corr"] - out_r["e_corr"]) < 1e-7
