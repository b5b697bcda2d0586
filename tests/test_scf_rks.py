"""Gamma-point RKS (LDA) parity on diamond with GTH pseudopotentials.

Golden values from /root/reference/pyscf/pbc/dft/test/test_krks.py:
  * diamond primitive (C2, gth-szv, gth-pade, mesh [17]^3), lda,vwn:
    e_tot = -10.221426445656439   (test_klda8_primitive_gamma, :118)
  * diamond cubic (C8), lda,vwn:
    e_tot = -44.892502703975893   (test_klda8_cubic_gamma, :97)
"""
import pytest

from pyscf_isdf_tpu.models import diamond_primitive, diamond_cubic
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel


def test_diamond_primitive_lda():
    cell = diamond_primitive(mesh=(17, 17, 17))
    assert cell.nao == 8
    assert cell.nelectron == 8
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-10.221426445656439, abs=1e-7)


@pytest.mark.slow
def test_diamond_cubic_lda():
    cell = diamond_cubic(mesh=(17, 17, 17))
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    assert res["e_tot"] == pytest.approx(-44.892502703975893, abs=1e-7)
