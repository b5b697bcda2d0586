"""ROHF: Roothaan effective-Fock open-shell SCF.

Exact limits: closed-shell ROHF == RHF; one-electron ROHF == UHF.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.rohf import rohf_kernel
from pyscf_isdf_tpu.scf.uhf import uhf_kernel


def test_rohf_closed_shell_equals_rhf():
    L = 4.0
    cell = build_cell(
        ((L, 0, 0), (0, L, 0), (0, 0, L)),
        [["He", (L / 2.0 - 0.5, L / 2.0, L / 2.0 - 0.5)],
         ["He", (L / 2.0, L / 2.0, L / 2.0 + 0.5)]],
        basis=[[0, (0.8, 1.0)], [0, (1.0, 1.0)], [0, (1.2, 1.0)]],
        mesh=[21] * 3,
    )
    system = build_scf_system(cell)
    ro = rohf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    rhf = scf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert ro["converged"]
    assert ro["e_tot"] == pytest.approx(rhf["e_tot"], abs=1e-9)


def test_rohf_one_electron_equals_uhf():
    cell = build_cell(
        np.eye(3) * 6.0, [["H", (3.0, 3.0, 3.0)]],
        basis=[[0, (1.3, 1.0)], [0, (0.4, 1.0)]], mesh=[25] * 3, spin=1,
    )
    system = build_scf_system(cell)
    ro = rohf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    u = uhf_kernel(system, xc=None, exxdiv="ewald", conv_tol=1e-10)
    assert ro["converged"]
    assert ro["e_tot"] == pytest.approx(u["e_tot"], abs=1e-10)


def test_roks_open_shell_above_uks():
    """Variational: UKS energy <= ROKS energy for an open-shell system."""
    cell = build_cell(
        np.eye(3) * 6.0, [["H", (3.0, 3.0, 3.0)]],
        basis=[[0, (1.3, 1.0)], [0, (0.4, 1.0)]], mesh=[25] * 3, spin=1,
    )
    system = build_scf_system(cell)
    ro = rohf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    u = uhf_kernel(system, xc="lda,vwn", conv_tol=1e-9)
    assert ro["converged"] and u["converged"]
    assert u["e_tot"] <= ro["e_tot"] + 1e-9
