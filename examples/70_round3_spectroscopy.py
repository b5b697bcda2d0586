#!/usr/bin/env python
"""Round-3 many-body spectroscopy tour: GW, evGW, RPA, ADC(2), CISD,
X2C, electron-phonon.

Small meshes keep this under ~2 min on CPU (CI executes every example,
tests/test_examples.py).
"""
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import pyscf_isdf_tpu as pit
from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.models import diamond_primitive

HA2EV = 27.211386

# --- G0W0 and evGW quasiparticle band edges on diamond (LDA start)
cell = diamond_primitive(mesh=(12, 12, 12))
mf = pit.RKS(cell, xc="lda,vwn")
mf.run()
gw = pit.GW(mf)
nocc = gw.nocc
print(f"LDA gap  : {(gw.mo_energy[nocc]-gw.mo_energy[nocc-1])*HA2EV:.2f} eV")
print(f"G0W0 gap : {(gw.qp_energy[nocc]-gw.qp_energy[nocc-1])*HA2EV:.2f} eV")

from pyscf_isdf_tpu.gw import evgw_gamma

ev = evgw_gamma(mf.system, mf._res, xc="lda,vwn")
print(f"evGW gap : {(ev.qp_energy[nocc]-ev.qp_energy[nocc-1])*HA2EV:.2f} eV")

# --- direct-RPA correlation energy
ec, etot = pit.RPA(mf)
print(f"RPA Ec   : {ec:.6f} Ha")

# --- ADC(2) ionization potential vs Koopmans on an H4 chain
L = 8.0
h4 = build_cell(np.eye(3) * L,
                [["H", (L / 2 - 1.8, L / 2, L / 2)],
                 ["H", (L / 2 - 0.6, L / 2, L / 2)],
                 ["H", (L / 2 + 0.7, L / 2, L / 2)],
                 ["H", (L / 2 + 1.9, L / 2, L / 2)]],
                basis="gth-szv", pseudo="gth-pade", mesh=[12] * 3)
hf = pit.RHF(h4, exxdiv=None)
hf.run()
from pyscf_isdf_tpu.cc import adc2_from_scf, cisd

ips, eas = adc2_from_scf(hf.system, hf._res, nroots=1)
print(f"ADC(2) IP: {ips[0]*HA2EV:.2f} eV "
      f"(Koopmans {-hf.mo_energy[1]*HA2EV:.2f} eV)")

# --- CISD correlation (variational bracket with CCSD/FCI)
e_corr, e_cisd = cisd(hf.system, hf._res)
print(f"CISD Ecorr: {e_corr:.6f} Ha")

# --- scalar-relativistic X2C: Si 1s lowering (all-electron, one-center)
import scipy.linalg

from pyscf_isdf_tpu.scf import x2c

si = build_cell(np.eye(3) * 200.0, [["Si", (100.0,) * 3]], "sto-3g",
                mesh=(4, 4, 4), dimension=0)
s1, t1, v1, w1 = x2c.atomic_blocks(si, 0)
e_nr = scipy.linalg.eigh(t1 + v1, s1, eigvals_only=True)
X = x2c.x2c1e_xmatrix(t1, v1, w1, s1)
h = x2c.get_hcore_fw(t1, v1, w1, s1, X)
e_r = scipy.linalg.eigh(h, s1, eigvals_only=True)
print(f"Si 1s scalar-relativistic shift: {(e_r[0]-e_nr[0])*HA2EV:.1f} eV")

print("OK")
