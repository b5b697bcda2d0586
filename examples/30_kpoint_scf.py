#!/usr/bin/env python
"""k-point sampled SCF (KRKS) and band structure."""
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.scf.bands import get_bands

cell = diamond_primitive(mesh=(17, 17, 17))

kpts = lattice.make_kpts(cell.a, [2, 2, 2], with_gamma_point=False)
ksys = build_kscf_system(cell, kpts)
kres = kscf_kernel(ksys, xc="lda,vwn", verbose=True)
print("KRKS 2x2x2 E =", kres["e_tot"])

# band path Gamma -> X from the Gamma-point density
system = build_scf_system(cell)
res = scf_kernel(system, xc="lda,vwn")
b = cell.reciprocal_vectors()
kpath = np.array([f * 0.5 * b[0] for f in np.linspace(0, 1, 8)])
bands, _ = get_bands(system, res, kpath, xc="lda,vwn")
print("valence bandwidth along Gamma-X:", bands[:, :4].max() - bands[:, :4].min())
