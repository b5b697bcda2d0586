"""Frequency-sharded G0W0: the imaginary-axis self-energy over a device mesh.

The GW-AC workload (gw/rgw.py) is a sum over quadrature frequencies of
independent Pi-build / dielectric-solve / W-contraction programs — an
embarrassingly parallel axis the reference has no distribution story
for (its pbc/gw is serial NumPy; the MPI layer covers only CCSD).
TPU-native: shard the frequency axis over the ICI mesh with shard_map,
each device runs the SAME batched program (gw/rgw.py _sigma_iw_batched)
on its frequency slice, one psum combines the self-energy.  Zero
cross-device traffic except the final (nmo, nw_sigma) reduction.

Zero-weight padding makes any nw divisible by the device count without
changing the quadrature (padded frequencies carry wts = 0)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.4.35 exposes shard_map at top level; the experimental
    # alias is deprecated (removed after jax 0.8)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from pyscf_isdf_tpu.gw.rgw import _sigma_iw_batched


def sigma_iw_sharded(Lmo, mo_energy, nocc, freqs, wts, omega_grid, ef,
                     mesh: Mesh, axis: str = "w"):
    """Distributed drop-in for gw/rgw.py _sigma_iw_batched.

    Pads (freqs, wts) to a multiple of the mesh size with zero-weight
    nodes, shards the frequency axis, psums the per-device self-energy
    contributions."""
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    nw = freqs.shape[0]
    pad = (-nw) % ndev
    # padded nodes at a harmless positive frequency with zero weight
    freqs_p = jnp.concatenate([jnp.asarray(freqs),
                               jnp.ones(pad, freqs.dtype)])
    wts_p = jnp.concatenate([jnp.asarray(wts), jnp.zeros(pad, wts.dtype)])

    def chunk(fw, ww):
        sig = _sigma_iw_batched(Lmo, mo_energy, nocc, fw, ww,
                                omega_grid, ef)
        return jax.lax.psum(sig, axis)

    fn = shard_map(chunk, mesh=mesh,
                   in_specs=(P(axis), P(axis)),
                   out_specs=P())
    return fn(freqs_p, wts_p)
