"""Symmetric supercell ISDF (per-q solves, assembled factorization) vs
the supercell FFTDF oracle — the BENCH_r03 certification machinery.

Identities:
  1. rank-saturated c: assembled robust K == supercell FFTDF K to 1e-8
     (the assembly phases/coset kernels/grid maps are exact);
  2. unsaturated c: the per-q residual-deficit certificate equals the
     direct supercell trace difference tr(D (K_exact - K_rob)) at the
     SAME density (mapped k->Gamma via dm_k2gamma), to 1%.

The probe density is a deterministic hcore-guess with exact
time-reversal symmetry enforced: at self-inverse k (2k = 0 mod G) the
exact h/S are real in this gauge, and projecting out the small
Nyquist-aliasing imaginary artifact keeps the unfolded supercell DM
real to machine precision (an SCF density at X carries an O(1e-3)
complex part from that artifact — see hcore discussion in scf/khf.py).
"""
import numpy as np
import scipy.linalg as sla
import jax.numpy as jnp

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.k2gamma import dm_k2gamma
from pyscf_isdf_tpu.models import diamond_primitive, diamond_supercell
from pyscf_isdf_tpu.scf import build_scf_system
from pyscf_isdf_tpu.scf.khf import build_kscf_system
from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod, isdf_sym

NREP = (2, 1, 1)
PM = (12, 12, 12)


def _setup():
    prim = diamond_primitive(mesh=PM)
    sc = diamond_supercell(nrep=NREP,
                           mesh=tuple(n * m for n, m in zip(NREP, PM)))
    kpts = lattice.make_kpts(prim.a, list(NREP), with_gamma_point=True)
    ksys = build_kscf_system(prim, kpts)
    ssys = build_scf_system(sc)
    C_w = _occ_orbitals(prim, ksys, kpts)
    return prim, sc, kpts, ksys, ssys, C_w


def _occ_orbitals(prim, ksys, kpts):
    """sqrt(occ)-weighted occupied orbitals of the TR-symmetrized
    hcore guess (deterministic, exactly real at self-inverse k)."""
    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    nocc = ksys.nelec_tot // (2 * nk)
    b = lattice.reciprocal_vectors(prim.a)
    frac2k = 2.0 * kpts @ np.linalg.inv(b)
    selfinv = np.abs(frac2k - np.rint(frac2k)).max(axis=1) < 1e-8
    C_w = []
    for k in range(nk):
        h = np.asarray(ksys.hcore[k])
        S = np.asarray(ksys.S[k])
        h = 0.5 * (h + h.conj().T)
        S = 0.5 * (S + S.conj().T)
        if selfinv[k]:
            h, S = h.real, S.real
        _, v = sla.eigh(h, S)
        C_w.append(np.sqrt(2.0) * v[:, :nocc].astype(np.complex128))
    return np.stack(C_w)


def _dm_super(prim, C_w, kpts):
    dm_k = np.einsum("kui,kvi->kuv", C_w, C_w.conj())
    dm_c = dm_k2gamma(prim, dm_k, kpts, NREP)
    assert np.abs(np.imag(dm_c)).max() < 1e-12
    return np.real(dm_c)


def test_assembled_robust_k_exact():
    prim, sc, kpts, ksys, ssys, C_w = _setup()
    dm_s = _dm_super(prim, C_w, kpts)
    sym = isdf_sym.build_sym(prim, NREP, ksys.aoR_k, kpts,
                             np.asarray(ssys.coulG), c=10.0)
    fac = isdf_sym.assemble(sym, ssys.aoR, prim.a)
    vk_ref = np.asarray(fftdf.get_k(ssys.aoR, jnp.asarray(dm_s),
                                    jnp.asarray(ssys.coulG),
                                    tuple(sc.mesh), sc.grid_weight))
    vk_rob = np.asarray(isdf_mod.get_k_robust(fac, ssys.aoR,
                                              jnp.asarray(dm_s),
                                              sc.grid_weight))
    assert np.abs(vk_rob - vk_ref).max() < 1e-8


def test_deficit_certificate_matches_direct():
    prim, sc, kpts, ksys, ssys, C_w = _setup()
    dm_s = _dm_super(prim, C_w, kpts)
    # UNSATURATED compression: nip = 4*nao < complex pair rank
    sym = isdf_sym.build_sym(prim, NREP, ksys.aoR_k, kpts,
                             np.asarray(ssys.coulG), c=4.0)
    fac = isdf_sym.assemble(sym, ssys.aoR, prim.a)
    vk_ref = np.asarray(fftdf.get_k(ssys.aoR, jnp.asarray(dm_s),
                                    jnp.asarray(ssys.coulG),
                                    tuple(sc.mesh), sc.grid_weight))
    vk_rob = np.asarray(isdf_mod.get_k_robust(fac, ssys.aoR,
                                              jnp.asarray(dm_s),
                                              sc.grid_weight))
    de_direct = float(np.einsum("ij,ji->", dm_s, vk_ref - vk_rob))

    psi_k = jnp.einsum("kgi,kij->kgj", ksys.aoR_k,
                       jnp.asarray(C_w, ksys.aoR_k.dtype))
    de_cert = isdf_sym.certify_deficit(sym, psi_k)
    assert de_cert > 0
    assert de_direct > 0
    assert abs(de_cert - de_direct) < 0.01 * de_direct


def test_residual_identity_gamma():
    """robust_k_error (the bench's on-device certifier) equals the
    direct supercell trace difference at the same density."""
    prim, sc, kpts, ksys, ssys, C_w = _setup()
    dm_s = _dm_super(prim, C_w, kpts)
    sym = isdf_sym.build_sym(prim, NREP, ksys.aoR_k, kpts,
                             np.asarray(ssys.coulG), c=4.0)
    fac = isdf_sym.assemble(sym, ssys.aoR, prim.a)
    vk_ref = np.asarray(fftdf.get_k(ssys.aoR, jnp.asarray(dm_s),
                                    jnp.asarray(ssys.coulG),
                                    tuple(sc.mesh), sc.grid_weight))
    vk_rob = np.asarray(isdf_mod.get_k_robust(fac, ssys.aoR,
                                              jnp.asarray(dm_s),
                                              sc.grid_weight))
    de_direct = float(np.einsum("ij,ji->", dm_s, vk_ref - vk_rob))
    # supercell occupied orbitals: eigenvectors of dm_s (PSD, rank
    # nk*nocc with eigenvalue 2)
    w, v = np.linalg.eigh(dm_s)
    keep = w > 1e-8
    C_super = v[:, keep] * np.sqrt(w[keep])
    de_res = isdf_mod.robust_k_error(fac, ssys.aoR,
                                     jnp.asarray(C_super, ssys.aoR.dtype),
                                     jnp.asarray(ssys.coulG),
                                     tuple(sc.mesh), sc.grid_weight)
    assert de_res > 0
    assert abs(de_res - de_direct) < 0.01 * de_direct
