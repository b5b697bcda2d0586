"""GW quasiparticle methods (G0W0) and RPA correlation energy.

Reference capability: /root/reference/pyscf/pbc/gw/ (krgw_ac.py 644 LoC,
krgw_cd.py, kugw_ac.py) and /root/reference/pyscf/gw/ (gw_ac, gw_exact,
rpa) — VERDICT r2 missing #8.

TPU-native redesign: the self-energy on the imaginary axis is computed
for ALL quadrature frequencies in one batched einsum program (the
frequency axis rides the MXU batch dimension instead of the reference's
per-w Python loop, krgw_ac.py:289-330); the density response
Pi[w] = 4 L_f[w] L^T is a stacked GEMM; dielectric inversions are a
batched solve. Host float64 handles only the tiny Pade continuation and
Newton quasiparticle solves.
"""
from pyscf_isdf_tpu.gw.rgw import (
    GWResult,
    gw_ac_gamma,
    rpa_ecorr_gamma,
)
from pyscf_isdf_tpu.gw.rgw import evgw_gamma
from pyscf_isdf_tpu.gw.gw_exact import gw_exact_gamma, drpa_diagonalize
from pyscf_isdf_tpu.gw.krgw import (KGWResult, kgw_ac, rpa_ecorr_kpts,
                                    dielectric_constant)
from pyscf_isdf_tpu.gw.ugw import UGWResult, ugw_ac_gamma, kugw_ac

__all__ = [
    "GWResult", "gw_ac_gamma", "rpa_ecorr_gamma", "evgw_gamma",
    "gw_exact_gamma", "drpa_diagonalize", "KGWResult", "kgw_ac", "rpa_ecorr_kpts", "dielectric_constant",
    "UGWResult", "ugw_ac_gamma", "kugw_ac",
]
