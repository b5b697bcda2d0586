"""All-electron Gaussian density fitting by range separation (analytic).

The uniform-mesh collocation engines (FFTDF/ISDF/grid-GDF) cannot
resolve deep-core basis functions: the mesh grows like ke ~ 74 a_max
(BECKE_GRIDS.md measured Si all-electron non-convergent at practical
cutoffs — the same regime the reference covers with analytic-integral
GDF, pyscf/pbc/df/df.py:127 + lib/pbc/fill_ints.c:528, while its FFTDF
warns off all-electron at pyscf/pbc/df/fft.py:221-227). This module is
the mesh-free path:

    1/r = erfc(w r)/r + erf(w r)/r

* SHORT-RANGE (erfc): decays like a Gaussian of range 1/w REGARDLESS of
  basis steepness, so the real-space lattice sums converge absolutely in
  a few image shells — computed analytically by the McMurchie-Davidson
  engine (ops/md_int.py), host float64;
* LONG-RANGE (erf): Fourier kernel v_lr(G) = 4 pi/G^2 exp(-G^2/(4 w^2))
  dies at |G| ~ 2 w sqrt(ln 1/eps) independent of exponents, so it is a
  SMALL G-sphere sum over analytic AO FTs (ops/ft_ao.py — exact, no
  collocation, no aliasing).

G = 0 convention: every reciprocal sum drops G = 0 (the repo-wide
exxdiv=None kernel convention, matching df/gdf.py's coulG[0] = 0 and
FFTDF). The real-space SR sums implicitly CONTAIN their G = 0 Fourier
component v_sr(0) = pi/w^2, which is subtracted analytically:

    j2c[P,Q] -= pi/(w^2 vol) q_P q_Q          (q_P = int chi_P)
    j3c[P,mn] -= pi/(w^2 vol) q_P S_mn
    vne[mn]  += pi Z_tot/(w^2 vol) S_mn

so the assembled tensors are EXACTLY the G-not-0 Coulomb-metric objects
the rest of the framework uses, evaluated without any grid. Total
energies then follow the standard neutral-cell composition (dropped-G0
J and V_ne + Ewald nuclear energy + madelung-shifted exchange).

The split is exact: results are w-independent (the strongest internal
check — tests/test_aegdf.py verifies two distant w values agree), and
0-dimension cells (omega=None, direct 1/r real-space) reproduce exact
molecular RHF against ops/md_int.int2e_molecular.

Auxiliary basis: the shared even-tempered product expansion
(df/gdf.py aug_etb_spec; reference pyscf/df/addons.py aug_etb).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df.gdf import GDF, make_auxcell, _get_jk_cd
from pyscf_isdf_tpu.ops import coulomb, ft_ao, md_int

__all__ = ["build_ae_gdf", "ae_hcore", "aehf_kernel", "lr_gvectors"]


def lr_gvectors(cell, omega: float, tol: float = 1e-14) -> np.ndarray:
    """All reciprocal vectors 0 < |G| <= Gmax with
    exp(-Gmax^2/(4 w^2)) = tol — the LR kernel's own support."""
    gmax = 2.0 * omega * np.sqrt(np.log(1.0 / tol))
    b = cell.reciprocal_vectors()
    # bound the integer search box by the inverse metric
    binv = np.linalg.inv(b)
    nmax = np.ceil(gmax * np.linalg.norm(binv, axis=0)).astype(int)
    grids = [np.arange(-n, n + 1) for n in nmax]
    m = np.stack(np.meshgrid(*grids, indexing="ij"), -1).reshape(-1, 3)
    Gv = m @ b
    g2 = np.einsum("gi,gi->g", Gv, Gv)
    keep = (g2 > 1e-12) & (g2 <= gmax * gmax)
    return Gv[keep]


def _vlr(Gv, omega):
    g2 = np.einsum("gi,gi->g", Gv, Gv)
    return 4.0 * np.pi / g2 * np.exp(-g2 / (4.0 * omega * omega))


def build_ae_gdf(cell, omega: float = 0.4, beta: float = 2.0,
                 l_extra: int = 2, lindep: float = 1e-10,
                 gtol: float = 1e-14, auxcell=None):
    """Assemble the whitened all-electron fit tensor (Gamma point).

    omega=None is the 0-dimension (molecular) mode: direct 1/r
    real-space integrals, no reciprocal part (only valid for
    dimension=0 cells where the lattice sums terminate).
    """
    if auxcell is None:
        auxcell = make_auxcell(cell, beta=beta, l_extra=l_extra)
    naux, nao = auxcell.nao, cell.nao

    j2c = md_int.int2c(auxcell, omega)
    j3c = md_int.int3c(cell, auxcell, omega)

    if omega is not None:
        vol = cell.vol
        Gv = lr_gvectors(cell, omega, gtol)
        vlr = _vlr(Gv, omega)
        ftP = ft_ao.ft_ao(auxcell, Gv)                    # (ng, naux)
        ftmn = ft_ao.ft_aopair(cell, Gv)                  # (ng, nao, nao)
        j2c = j2c + np.real(
            np.einsum("gP,g,gQ->PQ", ftP.conj(), vlr, ftP,
                      optimize=True)) / vol
        j3c = j3c + np.real(
            np.einsum("gP,g,gmn->Pmn", ftP.conj(), vlr, ftmn,
                      optimize=True)) / vol
        # subtract the SR sums' implicit G=0 component (pi/w^2 kernel)
        qP = np.real(ft_ao.ft_ao(auxcell, np.zeros((1, 3)))[0])
        S = md_int.overlap(cell)
        g0 = np.pi / (omega * omega * vol)
        j2c = j2c - g0 * np.outer(qP, qP)
        j3c = j3c - g0 * np.einsum("P,mn->Pmn", qP, S)

    w, U = np.linalg.eigh(j2c)
    keep = w > w.max() * lindep
    cd = (U[:, keep] / np.sqrt(w[keep])).T @ j3c.reshape(naux, -1)
    return GDF(cderi=jnp.asarray(cd.reshape(-1, nao, nao)),
               naux=int(keep.sum()))


def ae_hcore(cell, omega: float = 0.4, gtol: float = 1e-14):
    """All-electron core Hamiltonian h = T + V_ne (analytic, mesh-free).

    T from the closed-form lattice sums (ops/ft_ao); V_ne by the same
    range separation as the fit tensors, with the dropped-G0 convention
    (the pi Z_tot/(w^2 vol) S shift restores consistency with J's
    dropped G0 + the Ewald nuclear energy for neutral cells).
    Returns (S, h) float64.
    """
    S_c, T = ft_ao.overlap_and_kinetic_analytic(cell)
    S = np.asarray(S_c).real
    h = np.asarray(T).real + md_int.vne(cell, omega)
    if omega is not None:
        vol = cell.vol
        Z = np.asarray(cell.charges, float)
        Gv = lr_gvectors(cell, omega, gtol)
        vlr = _vlr(Gv, omega)
        ftmn = ft_ao.ft_aopair(cell, Gv)                  # (ng, nao, nao)
        SI = np.exp(-1j * cell.coords @ Gv.T)             # (natm, ng)
        vhatA = -(Z @ SI) * vlr                           # (ng,)
        h = h + np.real(
            np.einsum("g,gmn->mn", vhatA, ftmn.conj(),
                      optimize=True)) / vol
        h = h + np.pi * Z.sum() / (omega * omega * vol) * S
    return S, h


def aehf_kernel(cell, omega: float = 0.4, beta: float = 2.0,
                l_extra: int = 2, exxdiv: str = "ewald",
                max_cycle: int = 80, conv_tol: float = 1e-10,
                gdf: GDF | None = None, verbose: bool = False):
    """All-electron restricted HF, fully mesh-free (Gamma point).

    Thin wrapper over the SHARED SCF driver (scf/hf.scf_kernel with the
    all-electron analytic system, ae=True): the per-cycle J/K come from
    the whitened fit tensor (two GEMMs, device-side), everything else —
    CDIIS, occupations/smearing, convergence, result conventions — is
    the one framework-wide implementation (VERDICT r4 next #2 deleted
    the former inline B-matrix CDIIS here). Equivalent frontend:
    ``RHF(cell).density_fit('aegdf', omega=...)``.
    """
    from pyscf_isdf_tpu.scf.hf import build_scf_system, scf_kernel

    if gdf is None:
        gdf = build_ae_gdf(cell, omega=omega, beta=beta, l_extra=l_extra)
    system = build_scf_system(cell, ae=True, ae_omega=omega)

    def get_jk(dm, with_k, C_w=None):
        vj, vk = _get_jk_cd(gdf.cderi, jnp.asarray(dm, system.aoR.dtype))
        return vj, (vk if with_k else None)

    res = scf_kernel(system, xc=None, exxdiv=exxdiv, max_cycle=max_cycle,
                     conv_tol=conv_tol, get_jk=get_jk, verbose=verbose)
    res["gdf"] = gdf
    return res


# --------------------------------------------------------------- k-point
def _unique_q_canonical(cell, kpts):
    """Distinct momentum transfers q = k2 - k1 canonicalized to the
    first BZ (fractional parts in [-1/2, 1/2)): exactly nk classes on a
    uniform MP mesh. Returns (q_list (nq, 3), qmap (nk1, nk2) -> q idx
    for the pair (k1, k2)). The analytic lattice sums are exactly
    G-periodic in q, so the canonical representative is just a cache/
    whitening-frame key (cf. df/gdf.py q_data's frame-consistency note).
    """
    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    b_mat = 2.0 * np.pi * np.linalg.inv(cell.a.T)
    diffs = (kpts[None, :, :] - kpts[:, None, :]).reshape(-1, 3)  # q[k1,k2]
    scaled = (diffs @ cell.a.T) / (2.0 * np.pi)
    frac = scaled - np.floor(scaled + 0.5 - 1e-9)
    frac = np.round(frac, 10)
    uniq, inv = np.unique(frac, axis=0, return_inverse=True)
    qmap = inv.reshape(nk, nk)
    return uniq @ b_mat, qmap


def lr_gvectors_q(cell, q, omega: float, tol: float = 1e-14) -> np.ndarray:
    """Reciprocal vectors G with 0 < |q+G| <= Gmax for the q-shifted LR
    kernel support (the |q+G| ~ 0 exclusion only triggers for q in the
    reciprocal lattice — the dropped-G0 convention)."""
    gmax = 2.0 * omega * np.sqrt(np.log(1.0 / tol))
    b = cell.reciprocal_vectors()
    binv = np.linalg.inv(b)
    q = np.asarray(q, float)
    nmax = np.ceil((gmax + np.linalg.norm(q))
                   * np.linalg.norm(binv, axis=0)).astype(int)
    grids = [np.arange(-n, n + 1) for n in nmax]
    m = np.stack(np.meshgrid(*grids, indexing="ij"), -1).reshape(-1, 3)
    Gv = m @ b
    qG2 = np.einsum("gi,gi->g", Gv + q, Gv + q)
    keep = (qG2 > 1e-12) & (qG2 <= gmax * gmax)
    return Gv[keep]


def build_ae_gdf_kpts(cell, kpts, omega: float = 0.4, beta: float = 2.0,
                      l_extra: int = 2, lindep: float = 1e-10,
                      gtol: float = 1e-14, auxcell=None):
    """k-point all-electron fit tensors (analytic SR + G-sphere LR).

    Extends :func:`build_ae_gdf` to arbitrary k meshes — the steep/
    all-electron k-point regime the reference serves with GDF/RSDF
    (pyscf/pbc/df/df.py:127, rsdf.py:74, rsdf_builder.py:59). Per
    canonical momentum transfer q the whitened aux frame is shared by
    every (k1, k2) pair of that class (frame consistency, cf.
    df/gdf.py q_data). Returns a :class:`~pyscf_isdf_tpu.df.gdf.KGDF`
    consumed by the standard ``get_jk_kpts``.
    """
    from pyscf_isdf_tpu.df.gdf import KGDF
    from pyscf_isdf_tpu.ops import md_int_k
    from pyscf_isdf_tpu.ops.ft_ao import overlap_and_kinetic_analytic

    if auxcell is None:
        auxcell = make_auxcell(cell, beta=beta, l_extra=l_extra)
    kpts = np.reshape(np.asarray(kpts, float), (-1, 3))
    nk = len(kpts)
    naux, nao = auxcell.nao, cell.nao
    vol = cell.vol
    q_list, qmap = _unique_q_canonical(cell, kpts)
    nq = len(q_list)

    # ---- SR analytic lattice sums (Bloch-phased MD engine)
    j2c_q = md_int_k.int2c_q(auxcell, q_list, omega)        # (nq,naux,naux)
    X = md_int_k.int3c_kq(cell, auxcell, kpts, q_list, omega)

    # ---- LR G-sphere + G = 0 conventions
    qP = np.real(ft_ao.ft_ao(auxcell, np.zeros((1, 3)))[0])
    g0 = np.pi / (omega * omega * vol)
    S_k = [overlap_and_kinetic_analytic(cell, kpt=k)[0] for k in kpts]
    ft_aux = {}
    for iq, q in enumerate(q_list):
        Gv = lr_gvectors_q(cell, q, omega, gtol)
        vlr = _vlr(Gv + q, omega)
        ftP = ft_ao.ft_ao(auxcell, Gv, kpt=q)               # at q+G
        ft_aux[iq] = (Gv, vlr, ftP)
        j2c_q[iq] += np.einsum("gP,g,gQ->PQ", ftP.conj(), vlr, ftP,
                               optimize=True) / vol
        if np.linalg.norm(q) < 1e-9:
            # SR real-space sums contain v_sr(G=0) = pi/w^2; the
            # assembled metric must be the dropped-G0 object
            j2c_q[iq] -= g0 * np.outer(qP, qP)

    wh_q = []
    for iq in range(nq):
        w, U = np.linalg.eigh(0.5 * (j2c_q[iq] + j2c_q[iq].conj().T))
        keep = w > w.max() * lindep
        wh_q.append((U[:, keep] / np.sqrt(w[keep])).conj().T)

    cd = []
    for k1 in range(nk):
        row = []
        for k2 in range(nk):
            iq = qmap[k1, k2]
            q = q_list[iq]
            Gv, vlr, ftP = ft_aux[iq]
            j3c = np.array(X[k2, iq])                       # (naux,nao,nao)
            ftmn = ft_ao.ft_aopair(cell, Gv, q=q, kj=kpts[k2])
            j3c += np.einsum("gP,g,gmn->Pmn", ftP.conj(), vlr, ftmn,
                             optimize=True) / vol
            if iq == qmap[0, 0]:                            # q = 0 class
                j3c -= g0 * np.einsum("P,mn->Pmn", qP, S_k[k2])
            row.append(jnp.asarray(
                (wh_q[iq] @ j3c.reshape(naux, -1)).reshape(-1, nao, nao)))
        cd.append(tuple(row))
    return KGDF(cd=tuple(cd), nk=nk)


def _vlr_q(Gv, q, omega):
    return _vlr(Gv + np.asarray(q, float), omega)


def ae_hcore_kpts(cell, kpts, omega: float = 0.4, gtol: float = 1e-14):
    """Analytic all-electron S_k and h_k = T_k + V_ne,k (mesh-free).

    Same dropped-G0 composition as the Gamma :func:`ae_hcore`, per k.
    Returns (S_k (nk,nao,nao), h_k (nk,nao,nao)) complex128.
    """
    from pyscf_isdf_tpu.ops import md_int_k
    from pyscf_isdf_tpu.ops.ft_ao import overlap_and_kinetic_analytic

    kpts = np.reshape(np.asarray(kpts, float), (-1, 3))
    nk = len(kpts)
    Z = np.asarray(cell.charges, float)
    vol = cell.vol
    Gv = lr_gvectors(cell, omega, gtol)
    vlr = _vlr(Gv, omega)
    SI = np.exp(-1j * cell.coords @ Gv.T)                   # (natm, ng)
    vhatA = -(Z @ SI) * vlr                                 # (ng,)
    V_sr = md_int_k.vne_k(cell, kpts, omega)
    S_all, h_all = [], []
    for ik, k in enumerate(kpts):
        S, T = overlap_and_kinetic_analytic(cell, kpt=k)
        h = np.asarray(T) + V_sr[ik]
        ftmn = ft_ao.ft_aopair(cell, Gv, q=np.zeros(3), kj=k)
        # conj(ft[g,n,m]) = int conj(phi_m) phi_n e^{+iG.r} (the k-
        # hermitian orientation; at Gamma ftmn is (m,n)-symmetric and
        # this reduces to ae_hcore's form)
        h = h + np.einsum("g,gnm->mn", vhatA, ftmn.conj(),
                          optimize=True) / vol
        h = h + np.pi * Z.sum() / (omega * omega * vol) * np.asarray(S)
        S_all.append(np.asarray(S))
        h_all.append(0.5 * (h + h.conj().T))
    return np.stack(S_all), np.stack(h_all)


def aekhf_kernel(cell, kpts, omega: float = 0.4, beta: float = 2.0,
                 l_extra: int = 2, exxdiv: str = "ewald",
                 max_cycle: int = 80, conv_tol: float = 1e-10,
                 kgdf=None, verbose: bool = False):
    """All-electron k-point restricted HF, fully mesh-free.

    Thin wrapper over the SHARED k-point SCF driver (scf/khf.kscf_kernel
    with the all-electron analytic system, ae=True): per-cycle J/K from
    the whitened k fit tensors (df/gdf.py get_jk_kpts); DIIS, global
    Fermi filling, smearing, bands and result conventions are the one
    framework-wide implementation (VERDICT r4 next #2 deleted the former
    inline complex CDIIS here). Equivalent frontend:
    ``KRHF(cell, kpts).density_fit('aegdf', omega=...)``.
    """
    from pyscf_isdf_tpu.df.gdf import get_jk_kpts
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.utils.misc import device_complex

    kpts = np.reshape(np.asarray(kpts, float), (-1, 3))
    if kgdf is None:
        kgdf = build_ae_gdf_kpts(cell, kpts, omega=omega, beta=beta,
                                 l_extra=l_extra)
    system = build_kscf_system(cell, kpts, ae=True, ae_omega=omega)

    def get_jk(dm_k, with_k, C_w_k=None):
        vj, vk = get_jk_kpts(kgdf, [device_complex(d, system.aoR_k.dtype)
                                    for d in dm_k])
        return vj, (vk if with_k else None)

    res = kscf_kernel(system, xc=None, exxdiv=exxdiv, max_cycle=max_cycle,
                      conv_tol=conv_tol, get_jk=get_jk, verbose=verbose)
    res["kgdf"] = kgdf
    return res


def _e_nuc_molecular(cell):
    Z = np.asarray(cell.charges, float)
    R = cell.coords
    e = 0.0
    for i in range(len(Z)):
        for j in range(i):
            e += Z[i] * Z[j] / np.linalg.norm(R[i] - R[j])
    return float(e)
