"""All-electron uniform-mesh convergence study (BeckeGrids alternative).

The reference provides Becke atomic grids (reference
pyscf/pbc/dft/gen_grid.py:141-234) so that all-electron PBC-DFT can resolve
the nuclear cusp with radially-clustered points.  The TPU rebuild instead
keeps the single uniform FFT grid and buys cusp resolution with ke_cutoff;
this script documents the convergence so BECKE_GRIDS.md can quote the error
at each mesh.

Run:  JAX_PLATFORMS=cpu python tools/becke_study.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import time

import jax

# sitecustomize pre-imports jax with jax_platforms="axon,cpu"; the env var
# is read only at import, so force the platform via config (f64 needs CPU)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel

ANG2BOHR = 1.0 / 0.529177210903


def run(label, a, atoms, basis, kes, xc="lda,vwn"):
    print(f"== {label} ({basis}, {xc}) ==", flush=True)
    rows = []
    for ke in kes:
        cell = build_cell(a, atoms, basis=basis, pseudo=None,
                          ke_cutoff=float(ke), unit="Bohr")
        t0 = time.time()
        system = build_scf_system(cell)
        res = scf_kernel(system, xc=xc, max_cycle=120, conv_tol=1e-10)
        dt = time.time() - t0
        rows.append((ke, cell.mesh, res["e_tot"], res["converged"], dt))
        print("ke=%6.0f  mesh=%-14s ngrids=%7d  E=%.9f  conv=%s  %.0fs"
              % (ke, cell.mesh, np.prod(cell.mesh), res["e_tot"],
                 res["converged"], dt), flush=True)
    e_ref = rows[-1][2]
    for ke, mesh, e, conv, dt in rows:
        print("   ke=%6.0f  |E - E(best)| = %.3e Ha" % (ke, abs(e - e_ref)),
              flush=True)
    return rows


if __name__ == "__main__":
    # Si diamond, all-electron STO-3G (steepest exponent ~407 bohr^-2).
    a = np.array([[0.0, 2.715, 2.715],
                  [2.715, 0.0, 2.715],
                  [2.715, 2.715, 0.0]]) * ANG2BOHR
    atoms = [("Si", np.zeros(3)), ("Si", (a[0] + a[1] + a[2]) / 4.0)]
    run("Si diamond (all-electron)", a, atoms, "sto-3g",
        kes=[100, 200, 400, 800, 1200])

    # He fcc-like box: light element, shallow cusp, converges fast.
    ah = np.eye(3) * (3.5 * ANG2BOHR)
    run("He simple cubic (all-electron)", ah, [("He", np.zeros(3))],
        "sto-3g", kes=[50, 100, 200, 400])
