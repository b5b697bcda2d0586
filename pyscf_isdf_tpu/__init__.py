"""pyscf_isdf_tpu — a TPU-native periodic DFT/HF framework with ISDF J/K engines.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``NingZhang1/pyscf_isdf`` reference (PySCF 2.5 PBC stack + ISDF extension):
crystalline Gaussian AO machinery on uniform real-space grids, FFT-based
density fitting (J/K), GTH pseudopotentials, LDA/GGA/hybrid Kohn-Sham SCF,
k-point sampling, and the ISDF (interpolative separable density fitting)
factorization that turns the per-SCF-iteration exchange build from
O(nao * ngrids) FFTs into a handful of MXU GEMMs.

Architecture (TPU-first, not a port):
  * build-time geometry/basis work runs on host in float64 numpy
    (:mod:`pyscf_isdf_tpu.cell`, :mod:`pyscf_isdf_tpu.basis`),
  * all grid-sized compute (AO collocation, FFT J/K, ISDF build, SCF
    iterations) is pure-functional JAX, jit-compiled, with static shapes
    (:mod:`pyscf_isdf_tpu.ops`, :mod:`pyscf_isdf_tpu.df`,
    :mod:`pyscf_isdf_tpu.scf`),
  * multi-chip scaling shards the real-space grid axis over an ICI mesh with
    ``shard_map`` + XLA collectives (:mod:`pyscf_isdf_tpu.parallel`).
"""

__version__ = "0.1.0"

from pyscf_isdf_tpu.cell import Cell, build_cell  # noqa: F401
from pyscf_isdf_tpu.frontend import (  # noqa: F401
    RHF, RKS, UHF, UKS, ROHF, KRHF, KRKS, KUHF, KUKS, KROHF, KGHF, KRKSpU,
    MP2, KMP2, KMP2_stagger, CCSD, KCCSD, EOMCCSD, KEOMCCSD, Gradients,
    Stress, TDA, TDDFT,
    GW, RPA,
)
