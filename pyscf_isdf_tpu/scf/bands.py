"""Band energies at arbitrary k-points from a converged density.

Reference semantics: pyscf/pbc/scf/khf.py:581-607 (``get_bands``) — build
the Fock operator from the converged density at new "band" k-points and
diagonalize. Non-hybrid path: local effective potential (J + Vxc on the
grid) evaluated against Bloch AOs at each band k-point; hcore rebuilt per
k-point (analytic-FT S/T + GTH PP).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.ops import pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.ops.ft_ao import overlap_and_kinetic
from pyscf_isdf_tpu.ops.xc import XCSpec


def get_bands(system, scf_res, kpts_band, xc=None):
    """Band eigenvalues/vectors at ``kpts_band`` for a non-hybrid functional.

    Args:
        system: Gamma-point SCFSystem with the converged grid quantities.
        scf_res: result dict of scf_kernel (uses its density matrix).
        xc: the functional the SCF was run with (None -> pure Hartree).

    Returns (mo_energy (nb, nmo), mo_coeff list).
    """
    cell = system.cell
    mesh = system.mesh
    weight = system.weight

    # local effective potential on the grid from the converged density
    if hasattr(system, "aoR_k"):   # k-sampled SCF system
        aoR_k = system.aoR_k
        nk = aoR_k.shape[0]
        dmk = jnp.asarray(np.asarray(scf_res["dm"]), aoR_k.dtype)
        t = jnp.einsum("kgi,kij->kgj", aoR_k, dmk)
        rho = jnp.einsum("kgj,kgj->g", t, aoR_k.conj()).real / nk
    else:
        dm = jnp.asarray(scf_res["dm"], system.aoR.dtype)
        rho = fftdf.get_rho(system.aoR, dm)
    coulG = jnp.asarray(system.coulG)
    vR = fftdf.ifft3(coulG * fftdf.fft3(
        rho.astype(jnp.complex128 if rho.dtype == jnp.float64 else jnp.complex64),
        mesh), mesh).real
    if xc is not None:
        xcspec = XCSpec(xc)
        if xcspec.family != "lda":
            raise NotImplementedError("get_bands: LDA/Hartree only for now")
        _, vrho, _ = xcspec.exc_vxc(jnp.maximum(rho, 1e-30))
        vR = vR + vrho
    vR_np = np.asarray(vR, dtype=np.float64)

    kpts_band = np.reshape(np.asarray(kpts_band, dtype=np.float64), (-1, 3))
    es, cs = [], []
    for kb in kpts_band:
        aoRb = eval_ao_numpy(cell, kpt=kb)
        S, T = overlap_and_kinetic(cell, kpt=kb)
        if cell.pseudos:
            vloc, _ = pp_ops.get_vpploc(cell, aoRb)
            hk = np.asarray(T, complex) + vloc + pp_ops.get_vppnl(cell, kpt=kb)
        else:
            hk = np.asarray(T, complex) + pp_ops.get_nuc(cell, aoRb)
        veff = (aoRb.conj().T * vR_np) @ aoRb * cell.grid_weight
        F = hk + veff
        w, v = np.linalg.eigh(np.asarray(S, complex))
        keep = w > 1e-12
        X = v[:, keep] / np.sqrt(w[keep])
        e, u = np.linalg.eigh(X.conj().T @ F @ X)
        es.append(e)
        cs.append(X @ u)
    return np.array(es), cs
