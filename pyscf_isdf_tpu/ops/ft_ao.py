"""Analytic Fourier transforms of Gaussian AOs (host-side, float64).

For a solid-harmonic Gaussian ``phi(r) = c S_lm(r-A) exp(-a|r-A|^2)`` the
plane-wave matrix element is closed-form:

    FT[phi](G) = int phi(r) e^{-i G.r} dr
               = e^{-i G.A} (-i)^l (2a)^{-l} S_lm(G) (pi/a)^{3/2} e^{-G^2/(4a)}

(derived from S_lm harmonic + Gaussian FT; functional spec per the
reference's C kernel pyscf/lib/pbc/ft_ao.c via pyscf/pbc/df/ft_ao.py:63-102).

Because the periodic AO's Fourier-series coefficients are exactly these
analytic FTs (Poisson summation), overlap and kinetic matrices follow from
G-space quadrature with errors ~ exp(-Gmax^2/(4 a_min)) — machine-negligible
for any converged mesh:

    S_uv = (1/vol) sum_G  conj(ft_u(k+G)) ft_v(k+G)
    T_uv = (1/vol) sum_G  |k+G|^2/2 conj(ft_u(k+G)) ft_v(k+G)

This replaces the reference's libcint lattice-sum ``pbc_intor`` for
int1e_ovlp/int1e_kin (pyscf/pbc/scf/hf.py:633-658) with a mesh-native
formulation — no real-space integral library needed.
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics


def ft_ao(cell, Gv: np.ndarray, kpt=None) -> np.ndarray:
    """(ngrids, nao) analytic AO Fourier transforms at G (or k+G) vectors."""
    if kpt is not None:
        Gv = Gv + np.asarray(kpt)[None, :]
    ng = Gv.shape[0]
    G2 = np.einsum("gi,gi->g", Gv, Gv)
    out = np.empty((ng, cell.nao), dtype=np.complex128)
    ao_loc = cell.ao_loc
    for ish, sh in enumerate(cell.shells):
        A = cell.coords[sh.atom]
        phase = np.exp(-1j * Gv @ A)                                   # (ng,)
        ang = solid_harmonics(sh.l, Gv, np)                            # (ng, M)
        # radial part per contraction: (ng, K)
        rad = np.einsum(
            "gp,pk->gk",
            (np.pi / sh.exps[None, :]) ** 1.5
            * (2 * sh.exps[None, :]) ** (-sh.l)
            * np.exp(-G2[:, None] / (4 * sh.exps[None, :])),
            sh.coeffs,
        )
        il = (-1j) ** sh.l
        blk = il * phase[:, None, None] * rad[:, :, None] * ang[:, None, :]
        out[:, ao_loc[ish]:ao_loc[ish + 1]] = blk.reshape(ng, sh.nao)
    return out


def converged_st_mesh(cell) -> tuple:
    """Mesh whose G-truncation error in S/T is below machine precision.

    The FT of a primitive pair decays like exp(-G^2/(4 a_max)); requiring
    exp(-Gmax^2/(4 a_max)) < 1e-16 gives ke = Gmax^2/2 = 74 a_max. This is a
    build-time host-quadrature mesh only — the SCF grid is unaffected.
    """
    from pyscf_isdf_tpu import lattice

    a_max = max(float(sh.exps.max()) for sh in cell.shells)
    mesh = lattice.cutoff_to_mesh(cell.a, 74.0 * a_max)
    return tuple(int(max(m, c)) for m, c in zip(mesh, cell.mesh))


def overlap_and_kinetic(cell, mesh=None, kpt=None):
    """Overlap and kinetic matrices, exact lattice sums.

    Dispatches to the closed-form real-space path
    (:func:`overlap_and_kinetic_analytic`) — O(nshell^2 nprim^2 nimg)
    host work, independent of basis steepness — unless an explicit
    quadrature ``mesh`` is requested, in which case the G-space
    formulation below is used (kept as an independent cross-check; the
    two agree to ~1e-12, tested). Returns (S, T) real float64 at Gamma,
    complex at finite k.
    """
    if mesh is None:
        return overlap_and_kinetic_analytic(cell, kpt=kpt)
    Gv = cell.get_Gv(mesh)
    if kpt is not None:
        kG = Gv + np.asarray(kpt)[None, :]
    else:
        kG = Gv
    aoG = ft_ao(cell, Gv, kpt=kpt)
    kG2 = np.einsum("gi,gi->g", kG, kG)
    s = aoG.conj().T @ aoG / cell.vol
    t = (aoG.conj() * (0.5 * kG2)[:, None]).T @ aoG / cell.vol
    if kpt is None or np.allclose(kpt, 0):
        return s.real, t.real
    return s, t


def overlap_and_kinetic_analytic(cell, kpt=None, ktol=1e-16):
    """Closed-form lattice-sum overlap and kinetic matrices.

    Real-space analog of the G-space quadrature (functional counterpart
    of the reference's libcint ``pbc_intor('int1e_ovlp'/'int1e_kin')``,
    pyscf/pbc/scf/hf.py:633-658): per primitive pair and lattice image,
    the Gaussian product theorem reduces both integrals to 1-D moments
    E_n = int x^n e^{-p x^2} dx. The kinetic operator uses the identity
    (S_lm harmonic, homogeneous degree l):

        -1/2 nabla^2 [S_lm(u) e^{-b u^2}] = b(2l+3) phi - 2 b^2 u^2 phi

    so T needs only the same moments with the ket monomial raised by 2.
    Cost is O(nshell^2 nprim^2 nimg) — INDEPENDENT of basis steepness,
    unlike the G-space route whose quadrature mesh grows like a_max^{3/2}
    (prohibitive for all-electron cores). Agreement with the G-space
    version is ~1e-13 (tested).
    """
    from math import comb

    nao = cell.nao
    ao_loc = cell.ao_loc
    images = cell.lattice_images()
    kv = np.zeros(3) if kpt is None else np.asarray(kpt, dtype=np.float64)
    cplx = np.abs(kv).sum() > 1e-12
    dt = np.complex128 if cplx else np.float64
    S = np.zeros((nao, nao), dtype=dt)
    T = np.zeros((nao, nao), dtype=dt)

    shells = list(enumerate(cell.shells))
    for ish, shi in shells:
        A = cell.coords[shi.atom]
        mi, Ci = _monos(shi.l)
        for jsh, shj in shells:
            B0 = cell.coords[shj.atom]
            mj, Cj = _monos(shj.l)
            lj = shj.l
            nm_i, nm_j = len(mi), len(mj)
            s_shell = np.zeros((nm_i, nm_j), dtype=dt)
            t_shell = np.zeros((nm_i, nm_j), dtype=dt)
            s_kl = np.zeros((shi.coeffs.shape[1], shj.coeffs.shape[1],
                             nm_i, nm_j), dtype=dt)
            t_kl = np.zeros_like(s_kl)
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    p = a + b
                    AB = A[None, :] - B0[None, :] - images
                    K = np.exp(-(a * b / p)
                               * np.einsum("ti,ti->t", AB, AB))
                    sel = K > ktol
                    if not sel.any():
                        continue
                    Ksel = K[sel]
                    Timg = images[sel]
                    B = B0[None, :] + Timg
                    P = (a * A[None, :] + b * B) / p
                    dA = P - A[None, :]
                    dB = P - B
                    ph = Ksel * np.exp(1j * Timg @ kv) if cplx else Ksel
                    nmax = shi.l + lj + 2
                    E = np.zeros(nmax + 1)
                    E[0] = np.sqrt(np.pi / p)
                    for n in range(2, nmax + 1, 2):
                        E[n] = E[n - 2] * (n - 1) / (2 * p)

                    def axis_val(na, nb, d):
                        v = np.zeros(len(Ksel))
                        for e in range(na + 1):
                            ca = comb(na, e) * dA[:, d] ** (na - e)
                            for f in range(nb + 1):
                                if E[e + f] == 0.0:
                                    continue
                                v += ca * comb(nb, f) \
                                    * dB[:, d] ** (nb - f) * E[e + f]
                        return v

                    def accum(al, be):
                        return (axis_val(al[0], be[0], 0)
                                * axis_val(al[1], be[1], 1)
                                * axis_val(al[2], be[2], 2))

                    s_ij = np.empty((len(Ksel), nm_i, nm_j))
                    m_ij = np.empty_like(s_ij)
                    for ii, al in enumerate(mi):
                        for jj, be in enumerate(mj):
                            s_ij[:, ii, jj] = accum(al, be)
                            mm = 0.0
                            for d in range(3):
                                be2 = list(be)
                                be2[d] += 2
                                mm = mm + accum(al, tuple(be2))
                            m_ij[:, ii, jj] = mm
                    s_blk = np.einsum("t,tij->ij", ph, s_ij)
                    t_blk = b * (2 * lj + 3) * s_blk \
                        - 2.0 * b * b * np.einsum("t,tij->ij", ph, m_ij)
                    ckl = np.einsum("k,l->kl", shi.coeffs[ip],
                                    shj.coeffs[jp])
                    s_kl += ckl[:, :, None, None] * s_blk[None, None]
                    t_kl += ckl[:, :, None, None] * t_blk[None, None]
            # monomials -> solid harmonics, contractions -> AO block
            s_shell = np.einsum("klij,mi,nj->kmln", s_kl, Ci, Cj)
            t_shell = np.einsum("klij,mi,nj->kmln", t_kl, Ci, Cj)
            i0, i1 = ao_loc[ish], ao_loc[ish + 1]
            j0, j1 = ao_loc[jsh], ao_loc[jsh + 1]
            S[i0:i1, j0:j1] += s_shell.reshape(shi.nao, shj.nao)
            T[i0:i1, j0:j1] += t_shell.reshape(shi.nao, shj.nao)
    return S, T


# ------------------------------------------------- analytic AO-pair FTs
def _solid_monomials(l: int):
    """Exact Cartesian monomial coefficients of the real solid harmonics:
    S_lm(v) = sum_alpha c[m][alpha] x^ax y^ay z^az with |alpha| = l.

    Obtained by solving the (exact) linear system on sample points — the
    harmonics are homogeneous degree-l polynomials, so the fit is exact.
    """
    monos = [(i, j, l - i - j) for i in range(l + 1) for j in range(l + 1 - i)]
    rng = np.random.default_rng(7 + l)
    pts = rng.normal(size=(2 * len(monos) + 4, 3))
    M = np.stack([pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c
                  for (a, b, c) in monos], axis=1)
    Y = solid_harmonics(l, pts, np)                      # (npts, 2l+1)
    C, *_ = np.linalg.lstsq(M, Y, rcond=None)            # (nmono, 2l+1)
    C[np.abs(C) < 1e-12] = 0.0
    return monos, C.T                                    # (2l+1, nmono)


_MONO_CACHE: dict = {}


def _monos(l: int):
    if l not in _MONO_CACHE:
        _MONO_CACHE[l] = _solid_monomials(l)
    return _MONO_CACHE[l]


def _hermite_1d(Gd: np.ndarray, p: float, nmax: int):
    """I_n(g) = int x^n e^{-p x^2} e^{-i g x} dx for n = 0..nmax.

    I_n = (i/(2 sqrt(p)))^n H_n(g/(2 sqrt(p))) sqrt(pi/p) e^{-g^2/(4p)}
    with physicists' Hermite H_n. Returns (nmax+1, ng) complex.
    """
    s = 1.0 / (2.0 * np.sqrt(p))
    x = Gd * s
    H = np.empty((nmax + 1, len(Gd)))
    H[0] = 1.0
    if nmax >= 1:
        H[1] = 2 * x
    for n in range(2, nmax + 1):
        H[n] = 2 * x * H[n - 1] - 2 * (n - 1) * H[n - 2]
    base = np.sqrt(np.pi / p) * np.exp(-(Gd * Gd) / (4 * p))
    fac = (-1j * s) ** np.arange(nmax + 1)
    return fac[:, None] * H * base[None, :]


def ft_aopair(cell, Gv: np.ndarray, q=None, ktol: float = 1e-12,
              kj=None) -> np.ndarray:
    """Analytic Fourier transform of periodic AO pair products.

    out[g, mu, nu] = sum_T e^{i kj.T} int phi_mu(r) phi_nu(r-T)
                                          e^{-i (q+G).r} dr
    (Poisson summation). With kj=None (Gamma) these are the Fourier
    coefficients of the periodic pair density; with Bloch AOs this is
    the unit-cell integral  int_cell conj(phi^{k1}_mu) phi^{k2}_nu
    e^{-i(q+G).r} dr  for kj = k2 and q = k2 - k1 (carrying out the T1
    lattice sum leaves exactly the per-image phase e^{i k2.T}).
    Functional counterpart of the reference's ft_aopair_kpts
    (pyscf/pbc/df/ft_ao.py:63 -> lib/pbc/ft_ao.c), built from the
    Gaussian product theorem + Hermite closed forms — no integral
    library. Host float64, vectorized over lattice images; intended for
    the AFTDF engine and cross-checks (the FFT collocation path remains
    the production J/K route on TPU).
    """
    from math import comb

    kG = Gv + np.asarray(q)[None, :] if q is not None else Gv
    ng = kG.shape[0]
    nao = cell.nao
    ao_loc = cell.ao_loc
    images = cell.lattice_images()
    out = np.zeros((ng, nao, nao), dtype=np.complex128)

    shells = list(enumerate(cell.shells))
    for ish, shi in shells:
        A = cell.coords[shi.atom]
        mi, Ci = _monos(shi.l)
        for jsh, shj in shells:
            B0 = cell.coords[shj.atom]
            mj, Cj = _monos(shj.l)
            lt = shi.l + shj.l
            nm_i, nm_j = len(mi), len(mj)
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    p = a + b
                    AB = A - B0 - images                       # (nimg, 3)
                    K = np.exp(-(a * b / p)
                               * np.einsum("ti,ti->t", AB, AB))
                    sel = K > ktol
                    if not sel.any():
                        continue
                    Ksel = K[sel]
                    B = B0 + images[sel]                       # (nt, 3)
                    P = (a * A[None, :] + b * B) / p
                    dA = P - A[None, :]                        # (nt, 3)
                    dB = P - B
                    I1d = np.stack([_hermite_1d(kG[:, d], p, lt)
                                    for d in range(3)])        # (3,lt+1,ng)
                    phase = np.exp(-1j * (P @ kG.T)) * Ksel[:, None]  # (nt,ng)
                    if kj is not None:
                        phase = phase * np.exp(
                            1j * (images[sel] @ np.asarray(kj)))[:, None]
                    # per-image coefficient tensor C[t, ii, jj, nx, ny, nz]
                    nt = len(Ksel)
                    Cten = np.zeros((nt, nm_i, nm_j,
                                     lt + 1, lt + 1, lt + 1))
                    for ii, al in enumerate(mi):
                        for jj, be in enumerate(mj):
                            for ex in range(al[0] + 1):
                                cx = comb(al[0], ex) * dA[:, 0] ** (al[0] - ex)
                                for fx in range(be[0] + 1):
                                    cfx = cx * comb(be[0], fx) \
                                        * dB[:, 0] ** (be[0] - fx)
                                    for ey in range(al[1] + 1):
                                        cy = cfx * comb(al[1], ey) \
                                            * dA[:, 1] ** (al[1] - ey)
                                        for fy in range(be[1] + 1):
                                            cfy = cy * comb(be[1], fy) \
                                                * dB[:, 1] ** (be[1] - fy)
                                            for ez in range(al[2] + 1):
                                                cz = cfy * comb(al[2], ez) \
                                                    * dA[:, 2] ** (al[2] - ez)
                                                for fz in range(be[2] + 1):
                                                    cf = cz * comb(be[2], fz) \
                                                        * dB[:, 2] ** (be[2] - fz)
                                                    Cten[:, ii, jj,
                                                         ex + fx, ey + fy,
                                                         ez + fz] += cf
                    # I products on distinct (nx,ny,nz): (lt+1)^3 x ng
                    Iprod = np.einsum("xg,yg,zg->xyzg", I1d[0], I1d[1],
                                      I1d[2], optimize=True)
                    # sum images into G-space with phases, then contract I
                    Cg = np.einsum("tg,tijxyz->gijxyz", phase, Cten,
                                   optimize=True)
                    contrib = np.einsum("gijxyz,xyzg->gij", Cg,
                                        Iprod, optimize=True)
                    ci = shi.coeffs[ip]
                    cj = shj.coeffs[jp]
                    mcomp = np.einsum("gij,mi,nj->gmn", contrib, Ci, Cj,
                                      optimize=True)
                    piece = np.einsum("gmn,k,l->gkmln", mcomp, ci, cj,
                                      optimize=True)
                    out[:, ao_loc[ish]:ao_loc[ish + 1],
                        ao_loc[jsh]:ao_loc[jsh + 1]] += piece.reshape(
                            ng, shi.nao, shj.nao)
    return out
