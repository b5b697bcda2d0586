"""General basis ingestion (NWChem parser + shipped families).

Reference contract: pyscf serves its full basis library through an
NWChem-format parser (pyscf/gto/basis/parse_nwchem.py, dispatched by
pyscf/gto/basis/__init__.py). This framework ships the same published
families as data (basis/data/nwchem/) read by a from-scratch parser
(basis/nwchem.py). The energy anchors below are independent literature
values, so they validate extraction + parsing + normalization + the
analytic integral engines end to end.
"""
import numpy as np

from pyscf_isdf_tpu.basis import load_basis
from pyscf_isdf_tpu.basis import nwchem
from pyscf_isdf_tpu.ops import md_int, ft_ao

from test_md_int import _molecule, _rhf, _e_nuc


def test_shell_structures():
    """Published contraction patterns for representative elements."""
    def nao_of(name, sym):
        sh = load_basis(name, sym)
        return sum((2 * l + 1) * c.shape[1] for l, e, c in sh)

    assert nao_of("cc-pvdz", "H") == 5        # [2s1p]
    assert nao_of("cc-pvdz", "C") == 14       # [3s2p1d]
    assert nao_of("cc-pvtz", "C") == 30       # [4s3p2d1f]
    assert nao_of("cc-pvqz", "C") == 55       # [5s4p3d2f1g]
    assert nao_of("aug-cc-pvdz", "C") == 23   # [4s3p2d]
    assert nao_of("def2-svp", "Si") == 18     # [4s3p1d]
    assert nao_of("6-31g", "O") == 9          # [3s2p]
    assert nao_of("6-31gs", "C") == 14        # 6-31G(d)
    assert nao_of("cc-pvtz", "Fe") == 68      # [7s6p4d2f1g]


def test_general_contraction_columns():
    """cc-pVDZ Li S block is a genuine general contraction (2 columns
    over one exponent set) and survives normalization columnwise."""
    sh = load_basis("cc-pvdz", "Li")
    l0 = [s for s in sh if s[0] == 0]
    assert any(c.shape[1] >= 2 for _, _, c in l0)
    # contracted self-overlap == 1 for every column of every shell
    from pyscf_isdf_tpu.basis.gth import gaussian_int
    for l, e, c in sh:
        ee = gaussian_int(l * 2 + 2, e[:, None] + e[None, :])
        s = np.einsum("pi,pq,qi->i", c, ee, c)
        assert np.abs(s - 1.0).max() < 1e-12


def test_fused_sp_shells():
    """Pople 6-31G O: fused SP rows must split into one s and one p
    contraction sharing exponents."""
    sh = load_basis("6-31g", "O")
    ls = sorted(s[0] for s in sh)
    assert ls == [0, 0, 0, 1, 1]


def test_he_rhf_ccpvdz_literature():
    """He RHF/cc-pVDZ = -2.855160477243 Ha (EMSL/CCCBDB standard value);
    exact-integral RHF through md_int + ft_ao."""
    mol = _molecule([["He", (0.0, 0.0, 0.0)]], "cc-pvdz")
    S = md_int.overlap(mol)
    _, T = ft_ao.overlap_and_kinetic_analytic(mol)
    V = md_int.vne(mol, omega=None)
    eri = md_int.int2e_molecular(mol)
    e = _rhf(S, np.asarray(T).real + V, eri, 2)
    assert abs(e - (-2.85516047724274)) < 1e-9


def test_he_rhf_ccpvtz_literature():
    """He RHF/cc-pVTZ = -2.861153345 Ha (and the basis-set ladder is
    variational: TZ < DZ, both above the HF limit -2.8616800)."""
    mol = _molecule([["He", (0.0, 0.0, 0.0)]], "cc-pvtz")
    S = md_int.overlap(mol)
    _, T = ft_ao.overlap_and_kinetic_analytic(mol)
    V = md_int.vne(mol, omega=None)
    eri = md_int.int2e_molecular(mol)
    e = _rhf(S, np.asarray(T).real + V, eri, 2)
    assert abs(e - (-2.86115334)) < 1e-7
    assert -2.86168 < e < -2.85516047724274


def test_h2_rhf_ccpvdz():
    """H2/cc-pVDZ at R = 1.4 a0: E(RHF) ~= -1.12870 Ha (textbook
    benchmark, quoted to ~1e-5 across sources — the tight anchor is He
    above); exercises p polarization on H through the full pipeline and
    brackets against the HF limit -1.133630 (Kolos-Roothaan)."""
    R = np.array([[0, 0, 0], [0, 0, 1.4]], float)
    mol = _molecule([["H", tuple(R[0])], ["H", tuple(R[1])]], "cc-pvdz")
    S = md_int.overlap(mol)
    _, T = ft_ao.overlap_and_kinetic_analytic(mol)
    V = md_int.vne(mol, omega=None)
    eri = md_int.int2e_molecular(mol)
    e = _rhf(S, np.asarray(T).real + V, eri, 2) + _e_nuc([1, 1], R)
    assert abs(e - (-1.1287009)) < 2e-5
    assert -1.133630 < e < -1.116714   # above HF limit, below STO-3G


def test_parser_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        nwchem.parse("C  Q\n 1.0 1.0\n")
    with pytest.raises(ValueError):
        nwchem.parse("C  SP\n 1.0 1.0\n")   # 1 column for 2 l values
