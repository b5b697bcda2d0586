"""Round-2 tour: autodiff forces, geometry relaxation, stress, CCSD, GDF.

Everything below runs on CPU in f64 parity mode; on TPU the same code
runs f32. Each feature's oracle lives in tests/ (finite differences,
FCI, supercell equivalence).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # f64 parity demo; drop for TPU f32
import jax

jax.config.update("jax_enable_x64", True)
import numpy as np

import pyscf_isdf_tpu as pit
from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.models import diamond_primitive

# --- forces + stress on diamond (PBE0) --------------------------------
cell = diamond_primitive(mesh=(14, 14, 14))
mf = pit.RKS(cell, xc="pbe0")
mf.run()
g = pit.Gradients(mf)                       # (natm, 3) dE/dR by autodiff
print("forces (Ha/Bohr):\n", -g)

sigma = pit.Stress(mf)               # strain-autodiff stress tensor
print("stress (Ha/Bohr^3):\n", sigma, "\npressure:", -np.trace(sigma) / 3)

# --- geometry relaxation (FIRE on autodiff forces) --------------------
from pyscf_isdf_tpu.grad.optimize import optimize

L = 8.0
h2 = build_cell(np.eye(3) * L,
                [["H", (L / 2 - 1.1, L / 2, L / 2)],
                 ["H", (L / 2 + 1.1, L / 2, L / 2)]],
                basis="gth-szv", pseudo="gth-pade", mesh=[15] * 3)
relaxed, info = optimize(h2, xc=None, fmax=3e-3)
print("relaxed bond (Bohr):",
      np.linalg.norm(relaxed.coords[1] - relaxed.coords[0]))

# --- coupled cluster ---------------------------------------------------
mfh = pit.RHF(h2)
mfh.run()
e_corr, e_tot = pit.CCSD(mfh, with_t=True)  # CCSD(T)
print("CCSD(T):", e_tot)

mfe = pit.RHF(h2, exxdiv=None)
mfe.run()
print("EOM-CCSD EE (Ha):", pit.EOMCCSD(mfe, sector="ee", nroots=3))
print("EOM-CCSD IP (Ha):", pit.EOMCCSD(mfe, sector="ip", nroots=2))

kpts = lattice.make_kpts(cell.a, [2, 1, 1])
kmf = pit.KRHF(cell, kpts)
kmf.run()
e_corr_k, e_tot_k = pit.KCCSD(kmf)          # per unit cell
print("KCCSD e_corr/cell:", e_corr_k)

# --- Gaussian density fitting -----------------------------------------
e_gdf = pit.RKS(cell, xc="lda,vwn").density_fit("gdf").run()
print("RKS(GDF):", e_gdf)
