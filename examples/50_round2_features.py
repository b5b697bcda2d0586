"""Round-2 feature tour: HSE06, IBZ symmetry, DFT+U, bands, jitted DIIS.

Run on CPU (float64 parity mode):
    JAX_PLATFORMS=cpu python examples/50_round2_features.py
"""
import jax

jax.config.update("jax_platforms", "cpu")   # float64 parity mode
jax.config.update("jax_enable_x64", True)
import numpy as np

import pyscf_isdf_tpu as pit
from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive

cell = diamond_primitive(mesh=(15, 15, 15))
kpts = lattice.make_kpts(cell.a, [2, 2, 2])

# --- HSE06 (range-separated hybrid) with ISDF omega-split exchange
e_hse = pit.RKS(cell, xc="hse06").density_fit("isdf", c=10).run()
print("HSE06/ISDF   :", e_hse)

# --- IBZ k-point symmetry: 8 k-points reduced to 3
mf = pit.KRKS(cell, kpts, xc="lda,vwn", symmetry=True)
e_ibz = mf.kernel()
print("KRKS IBZ     :", e_ibz, "(nk_ibz =", mf._res["ibz"].nk_ibz, "of 8)")

# --- DFT+U on the carbon p shell
e_u = pit.KRKSpU(cell, kpts[:1], xc="lda,vwn", hubbard=[("C", 1, 0.1)]).run()
print("KRKS+U       :", e_u)

# --- hybrid band structure along Gamma -> X
mf0 = pit.RKS(cell, xc="pbe0")
mf0.kernel()
b = cell.reciprocal_vectors()
kpath = np.array([0.0 * b[0], 0.25 * b[0], 0.5 * b[0]])
bands, _ = mf0.get_bands(kpath)
print("PBE0 bands   :", np.round(bands[:, :4], 4))

# --- fully-jitted CDIIS SCF (one XLA program, early-exit convergence)
from pyscf_isdf_tpu.scf import build_scf_system
from pyscf_isdf_tpu.scf.jit_diis import run_scf_jit_diis

system = build_scf_system(cell)
e_jit, _, n_it, conv = run_scf_jit_diis(system, xc="pbe0", df="isdf",
                                        isdf_c=10, conv_tol=1e-10)
print("jitted PBE0  :", e_jit, f"({n_it} iterations, converged={conv})")
