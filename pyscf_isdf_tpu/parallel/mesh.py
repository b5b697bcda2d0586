"""Device-mesh helpers for multi-chip SPMD.

The framework's long axis is the real-space FFT grid (ngrids ~ 1e4-1e6
points; SURVEY.md section 2.5/5): aoR and every grid-sized tensor shard
along it over the ICI mesh. The AO/IP axes are small and stay replicated.
This replaces the reference's MPI machinery (pyscf/pbc/mpitools/mpi.py)
with single-controller JAX collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

GRID_AXIS = "g"


def grid_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the grid axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (GRID_AXIS,))
