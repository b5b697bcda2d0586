"""Distributed 3-D FFT / Poisson solve over the ICI device mesh.

Slab decomposition: grid-flat arrays (C order, x slowest) shard into
contiguous x-slabs. The 3-D transform is

    local FFT(y,z) on (nx/P, ny, nz)
    all_to_all transpose  ->  (nx, ny/P, nz)
    local FFT(x)

and the Poisson solve multiplies by the Coulomb kernel in the transposed
layout before inverting. This is the TPU-native replacement for the
reference's FFTW/MPI machinery (pyscf/lib/pbc/fft.c, mpitools) — the
all_to_all rides the ICI, everything else is local XLA batched 1-D FFTs.

All functions here are written to run *inside* ``shard_map`` over a 1-D
mesh with axis name ``GRID_AXIS``; slabs carry an optional leading batch
axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.parallel.mesh import GRID_AXIS


def coulG_transposed_layout(coulG, mesh3):
    """Rearrange a (ngrids,) G-space kernel into the mid-transform layout.

    Returns a flat array whose x-slab sharding corresponds to y-slabs of the
    (x-full) transposed layout: global shape (ny, nx, nz) flattened.
    """
    nx, ny, nz = mesh3
    return coulG.reshape(nx, ny, nz).transpose(1, 0, 2).reshape(-1)


def fft3_slab(f_slab, mesh3):
    """Forward 3-D FFT of x-slab data; returns the (x-full, y-sharded) layout.

    Args:
        f_slab: (..., nx/P * ny * nz) complex, this device's x-slab, flat.
    Returns:
        (..., nx * ny/P * nz) flat: transposed layout [x, y_local, z].
    """
    nx, ny, nz = mesh3
    batch = f_slab.shape[:-1]
    nxl = f_slab.shape[-1] // (ny * nz)
    f = f_slab.reshape(*batch, nxl, ny, nz)
    f = jnp.fft.fftn(f, axes=(-2, -1))
    # (b, nx/P, ny, nz) -> (b, nx, ny/P, nz): split y, concat x
    nb = len(batch)
    f = jax.lax.all_to_all(f, GRID_AXIS, split_axis=nb + 1, concat_axis=nb,
                           tiled=True)
    f = jnp.fft.fft(f, axis=nb)  # over full x
    return f  # (..., nx, ny/P, nz)


def ifft3_slab(fG_t, mesh3):
    """Inverse of :func:`fft3_slab`: (..., nx, ny/P, nz) back to flat x-slabs."""
    batch = fG_t.shape[:-3]
    nb = len(batch)
    f = jnp.fft.ifft(fG_t, axis=nb)
    f = jax.lax.all_to_all(f, GRID_AXIS, split_axis=nb, concat_axis=nb + 1,
                           tiled=True)
    f = jnp.fft.ifftn(f, axes=(-2, -1))
    return f.reshape(*batch, -1)


def poisson_slab(rho_slab, coulG_t_slab, mesh3):
    """V = ifft(coulG * fft(rho)) with all arrays in x-slab layout.

    ``coulG_t_slab`` is this device's slab of
    :func:`coulG_transposed_layout` output.
    """
    nx, ny, nz = mesh3
    nyl = coulG_t_slab.shape[-1] // (nx * nz)
    kernel = coulG_t_slab.reshape(nyl, nx, nz).transpose(1, 0, 2)  # [x, yl, z]
    cdtype = jnp.complex128 if rho_slab.dtype == jnp.float64 else jnp.complex64
    fG = fft3_slab(rho_slab.astype(cdtype), mesh3)
    fG = fG * kernel
    return ifft3_slab(fG, mesh3).real.astype(rho_slab.dtype)


def poisson_slab_c(f_slab, coulG_t_slab, mesh3):
    """Complex Poisson solve V = ifft(coulG * fft(f)) in x-slab layout.

    Unlike :func:`poisson_slab` the result keeps its imaginary part —
    needed for the q != 0 kernels of the k-point ISDF W build, where
    coulG(q+G) is not inversion-symmetric."""
    nx, ny, nz = mesh3
    nyl = coulG_t_slab.shape[-1] // (nx * nz)
    kernel = coulG_t_slab.reshape(nyl, nx, nz).transpose(1, 0, 2)
    fG = fft3_slab(f_slab, mesh3)
    fG = fG * kernel
    return ifft3_slab(fG, mesh3)
