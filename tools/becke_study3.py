"""All-electron diamond (carbon) uniform-mesh convergence (phase 3).

Carbon's STO-3G core (a_max ~ 71.6) is ~6x softer than silicon's, so the
uniform-mesh route should reach chemical accuracy at practical cutoffs —
the quantitative boundary of the Becke-grid-free design."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel

ANG2BOHR = 1.0 / 0.529177210903

a = np.array([[0.0, 1.7834, 1.7834],
              [1.7834, 0.0, 1.7834],
              [1.7834, 1.7834, 0.0]]) * ANG2BOHR
atoms = [("C", np.zeros(3)), ("C", (a[0] + a[1] + a[2]) / 4.0)]

for ke in [400, 800, 1200, 1600, 2000, 2400]:
    cell = build_cell(a, atoms, basis="sto-3g", pseudo=None,
                      ke_cutoff=float(ke), unit="Bohr")
    t0 = time.time()
    system = build_scf_system(cell)
    res = scf_kernel(system, xc="lda,vwn", max_cycle=100, conv_tol=1e-10)
    print("ke=%6.0f  mesh=%-15s ngrids=%8d  E=%.9f  conv=%s  %.0fs"
          % (ke, cell.mesh, np.prod(cell.mesh), res["e_tot"],
             res["converged"], time.time() - t0), flush=True)
