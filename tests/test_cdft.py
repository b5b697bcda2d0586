"""Constrained DFT: external-potential seam + charge constraint.

Contracts tested:
  * v_ext=0 reproduces the plain SCF exactly.
  * orbital_shift: a large shift on the occupied orbital of a He2 cell
    pushes density out of it (population drops), and the reported energy
    is the plain functional of the constrained density (variational:
    higher than the unconstrained minimum).
  * cdft_kernel: the Löwdin fragment population hits the target within
    tolerance, and the constrained energy is above the unconstrained one.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.cdft import (cdft_kernel, lowdin_population_op,
                                     orbital_shift)


@pytest.fixture(scope="module")
def he2():
    # H2: 2 AOs, 1 occupied + 1 virtual, so the density can respond to
    # the constraint potentials (a fully-occupied basis cannot).
    a = 6.0 * np.eye(3)
    cell = build_cell(a, [["H", (2.3, 3.0, 3.0)],
                          ["H", (3.7, 3.0, 3.0)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[20] * 3)
    return build_scf_system(cell)


def test_vext_zero_is_plain_scf(he2):
    res0 = scf_kernel(he2, xc="lda,vwn", conv_tol=1e-11)
    res1 = scf_kernel(he2, xc="lda,vwn", conv_tol=1e-11,
                      v_ext=np.zeros_like(he2.S))
    assert res1["e_tot"] == pytest.approx(res0["e_tot"], abs=1e-10)


def test_orbital_shift_depopulates(he2):
    res0 = scf_kernel(he2, xc="lda,vwn", conv_tol=1e-11)
    c0 = res0["mo_coeff"][:, 0]
    V = orbital_shift(he2.S, c0, 2.0)
    res1 = scf_kernel(he2, xc="lda,vwn", conv_tol=1e-11, v_ext=V)
    pop0 = float(c0 @ he2.S @ res0["dm"] @ he2.S @ c0)
    pop1 = float(c0 @ he2.S @ res1["dm"] @ he2.S @ c0)
    assert pop1 < pop0 - 0.1
    # energy excludes the shift and is variational above the minimum
    assert res1["e_tot"] > res0["e_tot"]


def test_charge_constraint(he2):
    res0 = scf_kernel(he2, xc="lda,vwn", conv_tol=1e-11)
    P = lowdin_population_op(he2.S, [0])
    n0 = float(np.einsum("ij,ji->", P, res0["dm"]))
    target = n0 - 0.3
    res = cdft_kernel(he2, "lda,vwn", [0], target, conv_tol=1e-11)
    assert res["population"] == pytest.approx(target, abs=1e-6)
    assert res["e_tot"] > res0["e_tot"]
    # multiplier sign: removing charge from fragment 0 needs lam > 0
    assert res["lam"] > 0
