#!/usr/bin/env python
"""Rounds 4-5 feature tour: deep-core GW-CD (restricted AND
spin-polarized), production k-point EOM-IP/EA with spectroscopic
factors, the all-electron analytic DF as a first-class
density_fit('aegdf') engine, the on-device double-float (dd) ISDF
build, and occupation-padded k-CCSD on a doped reference.

Small meshes keep this under ~3 min on CPU (CI executes every example,
tests/test_examples.py).
"""
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import pyscf_isdf_tpu as pit
from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.models import diamond_primitive

HA2EV = 27.211386

# --- contour-deformation G0W0: the deep-core QP path (reference
#     gw_cd.py/krgw_cd.py). AC (Pade) is fine for frontier states; CD
#     evaluates Sigma_c at real frequency and stays reliable far below
#     the Fermi level.
cell = diamond_primitive(mesh=(12, 12, 12))
mf = pit.RKS(cell, xc="lda,vwn")
mf.run()
cd = pit.GW(mf, method="cd", orbs=[0, 1, 2, 3, 4])
ac = pit.GW(mf, orbs=[0, 1, 2, 3, 4])
print("G0W0 frontier QP (CD vs AC, eV):",
      np.round(cd.qp_energy[3] * HA2EV, 3),
      np.round(ac.qp_energy[3] * HA2EV, 3))

# --- spin-polarized GW-CD (EXCEEDS the reference — its CD is
#     restricted-only): deep level of an open-shell H3 chain
L = 8.0
rad = build_cell(np.eye(3) * L,
                 [["H", (L / 2 - 1.5, L / 2, L / 2)],
                  ["H", (L / 2, L / 2, L / 2)],
                  ["H", (L / 2 + 1.5, L / 2, L / 2)]],
                 basis="gth-szv", pseudo="gth-pade", mesh=[12] * 3,
                 spin=1)
umf = pit.UKS(rad, xc="lda,vwn")
umf.kernel()
ucd = pit.GW(umf, method="cd", orbs=[0])
print("open-shell deep QP (alpha/beta, eV):",
      np.round(ucd.qp_energy[0][0] * HA2EV, 3),
      np.round(ucd.qp_energy[1][0] * HA2EV, 3))

# --- production EOM-IP/EA at k-points WITH pole strengths
#     (k-resolved photoemission; the reference kadc spectroscopic-
#     factor role at CCSD accuracy)
h2 = build_cell(np.array([[2.8, 0, 0], [0, 6.0, 0], [0, 0, 6.0]]),
                [["H", (0.0, 3.0, 3.0)], ["H", (1.3, 3.0, 3.0)]],
                basis="gth-szv", pseudo="gth-pade", mesh=[8, 16, 16])
kpts = lattice.make_kpts(h2.a, [2, 1, 1])
kmf = pit.KRHF(h2, kpts, exxdiv=None)
kmf.conv_tol = 1e-12
kmf.kernel()
ips, weights, r1s = pit.KEOMCCSD(kmf, sector="ip", nroots=3,
                                 return_weights=True)
print("EOM-IP roots (eV) :", np.round(ips * HA2EV, 3))
print("pole strengths    :", np.round(weights, 3))

# --- all-electron analytic DF as a first-class engine: S/hcore and
#     J/K are mesh-free (McMurchie-Davidson SR lattice sums + analytic
#     LR G-sphere), so steep cores converge where grid methods cannot
#     (the reference's GDF/RSDF regime) — one density_fit() call
he = build_cell(np.eye(3) * 6.0, [["He", (0.0, 0.0, 0.0)]],
                "sto-3g", ke_cutoff=200.0)
kpts_he = lattice.make_kpts(he.a, [2, 1, 1])
e_ae = pit.KRHF(he, kpts_he).density_fit("aegdf", omega=0.4).kernel()
print(f"all-electron KRHF (aegdf): {e_ae:.8f} Ha/cell")

# --- the on-device double-float (dd) ISDF build: f64-grade
#     interpolation-vector conditioning from f32 data (what certifies
#     the TPU bench headline with no host-f64 staging)
mf_dd = pit.RKS(cell, xc="pbe0").density_fit("isdf-robust", c=12,
                                             precision="dd")
e_dd = mf_dd.kernel()
print(f"PBE0 with dd-built robust ISDF: {e_dd:.8f} Ha")

# --- occupation-padded k-CCSD: a rigid-band DOPED reference with
#     non-uniform per-k occupation runs through the production blocked
#     tier (reference _padding_k_idx machinery)
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.cc.kccsd_blocked import kccsd_blocked

ksys = build_kscf_system(h2, kpts)
res = kscf_kernel(ksys, conv_tol=1e-10)
occ = np.array(res["mo_occ"])
occ[1, 1] = 2.0                       # dope the conduction minimum
doped = dict(res)
doped["mo_occ"] = occ
out = kccsd_blocked(ksys, doped, conv_tol=1e-10)
print(f"doped-reference blocked KCCSD e_corr: {out['e_corr']:.8f} Ha "
      f"(per-k nocc = {[int(n) for n in (occ > 0.5).sum(axis=1)]})")

# --- Becke atomic-grid XC quadrature (reference BeckeGrids): opt-in
#     per-atom quadrature that clusters points at nuclear cusps; the
#     compact covariant partition keeps the cell integral identity
#     exact, so accuracy is a pure resolution knob ('becke:n_rad,n_theta')
mf_bk = pit.RKS(cell, xc="lda,vwn")
mf_bk.exxdiv = None
mf_bk.xc_grids = "becke:40,10"
e_bk = mf_bk.run()
mf_un = pit.RKS(cell, xc="lda,vwn")
mf_un.exxdiv = None
e_un = mf_un.run()
print(f"LDA on Becke vs uniform quadrature: {e_bk:.6f} vs {e_un:.6f} Ha "
      f"(|dE| = {abs(e_bk - e_un):.1e})")
