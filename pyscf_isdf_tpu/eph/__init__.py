"""Electron-phonon coupling (Gamma point).

Reference capability: /root/reference/pyscf/pbc/eph/eph_fd.py —
VERDICT r2 missing #8 (L7 periphery).
"""
from pyscf_isdf_tpu.eph.eph_fd import (
    eph_kernel, phonon_modes, EPHResult,
)

__all__ = ["eph_kernel", "phonon_modes", "EPHResult"]
