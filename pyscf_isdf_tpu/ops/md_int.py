"""Analytic real-space Coulomb integrals over Gaussians (McMurchie-Davidson).

Host-side float64 build machinery for the all-electron GDF
(``df/aegdf.py``). The uniform-mesh collocation route fails for deep-core
(steep) basis functions — the mesh needed grows like ke ~ 74 a_max
(BECKE_GRIDS.md measured Si all-electron non-convergence). The fix is a
range-separated assembly:

    1/r = erfc(w r)/r  +  erf(w r)/r

* the SHORT-RANGE (erfc) part decays like a Gaussian of range 1/w, so its
  real-space lattice sum converges absolutely within a few image shells
  REGARDLESS of basis steepness — computed here analytically via the
  McMurchie-Davidson Hermite expansion (E coefficients + R tensor + Boys
  function), vectorized numpy, no integral library;
* the LONG-RANGE (erf) part has the Fourier kernel
  v_lr(G) = 4 pi/G^2 exp(-G^2/(4 w^2)) which decays with the SAME
  Gaussian rate independent of exponents, so it lives on a modest G-mesh
  with the analytic AO FTs of ``ops/ft_ao.py`` (handled by the caller).

Functional counterpart of the reference's real-space 3c2e machinery
(pyscf/lib/pbc/fill_ints.c:528 driven by pyscf/pbc/df/rsdf_builder.py:59,
libcint Rys kernels); here every integral class reduces to one Hermite
R-tensor recursion evaluated over lattice-image batches.

Kernel conventions (``omega``):
    omega=None  -> full 1/r        (molecular / 0-dimension anchors)
    omega=w     -> erfc(w r)/r     (the PBC short-range piece)

All public functions return integrals over the repo's AO convention:
contracted real-solid-harmonic Gaussians, shell component ordering
(ctr-major, then m) matching ops/ft_ao.ft_ao and ops/ao_eval.
"""
from __future__ import annotations

import numpy as np
from scipy import special as _sp

from pyscf_isdf_tpu.ops.ft_ao import _monos

__all__ = [
    "boys", "int2c", "int3c", "vne", "int2e_molecular", "overlap",
]


# ------------------------------------------------------------------ Boys
def boys(nmax: int, T: np.ndarray) -> np.ndarray:
    """Boys functions F_n(T), n = 0..nmax. Returns (nmax+1, *T.shape).

    Top order from the regularized incomplete gamma, then the stable
    downward recursion F_n = (2T F_{n+1} + e^-T) / (2n+1).
    """
    T = np.asarray(T, dtype=np.float64)
    out = np.empty((nmax + 1,) + T.shape)
    small = T < 1e-13
    Ts = np.where(small, 1.0, T)
    m = nmax
    top = _sp.gammainc(m + 0.5, Ts) * _sp.gamma(m + 0.5) \
        / (2.0 * Ts ** (m + 0.5))
    out[m] = np.where(small, 1.0 / (2 * m + 1) - T / (2 * m + 3), top)
    if nmax > 0:
        emt = np.exp(-T)
        for n in range(nmax - 1, -1, -1):
            out[n] = np.where(
                small, 1.0 / (2 * n + 1) - T / (2 * n + 3),
                (2.0 * T * out[n + 1] + emt) / (2 * n + 1))
    return out


def _kernel_F(nmax: int, rho: float, R2: np.ndarray, omega) -> np.ndarray:
    """F-table for the requested kernel: (nmax+1, n) over squared
    distances R2, such that the R-tensor recursion is unchanged.

    full 1/r:      F_n(rho R2)
    erf(w r)/r:    u^(2n+1) F_n(u^2 rho R2),  u^2 = w^2/(rho + w^2)
                   (d/dT tilde-F_n = -tilde-F_{n+1} holds, so the Hermite
                   recursion applies verbatim)
    erfc(w r)/r:   difference of the two.
    """
    F = boys(nmax, rho * R2)
    if omega is None:
        return F
    u2 = omega * omega / (rho + omega * omega)
    Flr = boys(nmax, u2 * rho * R2)
    fac = np.sqrt(u2) ** (2 * np.arange(nmax + 1) + 1)
    return F - fac[:, None] * Flr


# ------------------------------------------------------- Hermite E and R
def _e1d(la: int, lb: int, PA: np.ndarray, PB: np.ndarray, p: float,
         K: np.ndarray) -> np.ndarray:
    """1D McMurchie-Davidson expansion coefficients E_t^{ij}, vectorized
    over points: x_A^i x_B^j exp(-a x_A^2 - b x_B^2)
                 = sum_t E_t^{ij} Lambda_t(x; p, P).

    Returns (la+1, lb+1, la+lb+1, n); K = exp(-mu X_AB^2) seeds E_0^{00}.
    """
    n = PA.shape[0]
    lt = la + lb
    E = np.zeros((la + 1, lb + 1, lt + 2, n))
    E[0, 0, 0] = K
    inv2p = 1.0 / (2.0 * p)
    for i in range(la):
        for t in range(i + 2):
            E[i + 1, 0, t] = PA * E[i, 0, t] + (t + 1) * E[i, 0, t + 1]
            if t > 0:
                E[i + 1, 0, t] += inv2p * E[i, 0, t - 1]
    for j in range(lb):
        for i in range(la + 1):
            for t in range(i + j + 2):
                E[i, j + 1, t] = PB * E[i, j, t] + (t + 1) * E[i, j, t + 1]
                if t > 0:
                    E[i, j + 1, t] += inv2p * E[i, j, t - 1]
    return E[:, :, : lt + 1]


def _e1d_single(l: int, c: float) -> np.ndarray:
    """Hermite expansion of a SINGLE Gaussian's monomials about its own
    center: x^k exp(-c x^2) = sum_t d[k, t] Lambda_t(x; c, C).

    d is (l+1, l+1), point-independent (PA = 0)."""
    d = np.zeros((l + 1, l + 2))
    d[0, 0] = 1.0
    inv2c = 1.0 / (2.0 * c)
    for k in range(l):
        for t in range(k + 2):
            d[k + 1, t] = (t + 1) * d[k, t + 1]
            if t > 0:
                d[k + 1, t] += inv2c * d[k, t - 1]
    return d[:, : l + 1]


def _r_tensor(L: int, rho: float, PC: np.ndarray, F: np.ndarray):
    """Hermite Coulomb derivatives R_{tuv}(rho, PC) for t+u+v <= L.

    F is the (L+1, n) kernel table from :func:`_kernel_F` (its auxiliary
    index satisfies dF_n/dT = -F_{n+1}).  Returns dict {(t,u,v): (n,)}.
    """
    X, Y, Z = PC[:, 0], PC[:, 1], PC[:, 2]
    base = ((-2.0 * rho) ** np.arange(L + 1))[:, None] * F   # (L+1, n)
    memo: dict = {(0, 0, 0): base}

    def rec(t, u, v):
        key = (t, u, v)
        if key in memo:
            return memo[key]
        # R_t^(n) = X R_{t-1}^(n+1) + (t-1) R_{t-2}^(n+1): BOTH terms
        # shift the auxiliary order by one (the [1:] slice)
        rem = L - (t + u + v) + 1
        if t >= 1:
            val = X[None, :] * rec(t - 1, u, v)[1:1 + rem]
            if t >= 2:
                val = val + (t - 1) * rec(t - 2, u, v)[1:1 + rem]
        elif u >= 1:
            val = Y[None, :] * rec(t, u - 1, v)[1:1 + rem]
            if u >= 2:
                val = val + (u - 1) * rec(t, u - 2, v)[1:1 + rem]
        else:
            val = Z[None, :] * rec(t, u, v - 1)[1:1 + rem]
            if v >= 2:
                val = val + (v - 1) * rec(t, u, v - 2)[1:1 + rem]
        memo[key] = val
        return val

    out = {}
    for t in range(L + 1):
        for u in range(L + 1 - t):
            for v in range(L + 1 - t - u):
                out[(t, u, v)] = rec(t, u, v)[0]
    return out


def _e3_cart(shi_l, shj_l, mi, mj, A, B, a, b):
    """3D E coefficients for every (cart_i, cart_j) monomial pair of a
    primitive pair, vectorized over ket images B (nt, 3).

    Returns (E3 dict {(ai, bj): {(t,u,v): (nt,)}}, p, P (nt,3))."""
    p = a + b
    mu = a * b / p
    AB = A[None, :] - B                                     # (nt, 3)
    K1 = np.exp(-mu * AB * AB)                              # per-axis
    P = (a * A[None, :] + b * B) / p
    PA = P - A[None, :]
    PB = P - B
    Ex = _e1d(shi_l, shj_l, PA[:, 0], PB[:, 0], p, K1[:, 0])
    Ey = _e1d(shi_l, shj_l, PA[:, 1], PB[:, 1], p, K1[:, 1])
    Ez = _e1d(shi_l, shj_l, PA[:, 2], PB[:, 2], p, K1[:, 2])
    return (Ex, Ey, Ez), p, P


def _sph_contract(I_cart, Ci, Cj):
    """(..., nm_i, nm_j) cartesian-monomial block -> solid harmonics."""
    return np.einsum("Ma,Nb,...ab->...MN", Ci, Cj, I_cart, optimize=True)


def _shell_norm_blocks(cell):
    """Per-shell (monos, C, coeffs) lists; AO layout bookkeeping."""
    blocks = []
    for sh in cell.shells:
        mi, Ci = _monos(sh.l)
        blocks.append((sh, mi, Ci))
    return blocks


def _bra_images(cell, shi, shj, a, b, ktol):
    """Ket-center images with non-negligible pair overlap."""
    images = cell.lattice_images()
    A = cell.coords[shi.atom]
    B0 = cell.coords[shj.atom]
    p = a + b
    mu = a * b / p
    AB = A[None, :] - (B0[None, :] + images)
    K = np.exp(-mu * np.einsum("ti,ti->t", AB, AB))
    sel = K > ktol
    return B0[None, :] + images[sel]


def _sr_rcut(omega, rho, tol=36.0):
    """Squared-distance cutoff for the erfc kernel between Hermite
    distributions: contribution ~ erfc(w_eff R) with
    1/w_eff^2 = 1/w^2 + 1/rho;  erfc(x) < exp(-x^2)."""
    if omega is None:
        return np.inf
    weff2 = 1.0 / (1.0 / (omega * omega) + 1.0 / rho)
    return tol / weff2


# ------------------------------------------------------------- integrals
def overlap(cell, ktol: float = 1e-14) -> np.ndarray:
    """Lattice-summed overlap via the Hermite expansion (E_000 term).

    Cross-check path against ops/ft_ao.overlap_and_kinetic_analytic."""
    nao = cell.nao
    out = np.zeros((nao, nao))
    ao_loc = cell.ao_loc
    blocks = _shell_norm_blocks(cell)
    for ii, (shi, mi, Ci) in enumerate(blocks):
        A = cell.coords[shi.atom]
        for jj, (shj, mj, Cj) in enumerate(blocks):
            blk = np.zeros((shi.coeffs.shape[1], 2 * shi.l + 1,
                            shj.coeffs.shape[1], 2 * shj.l + 1))
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    B = _bra_images(cell, shi, shj, a, b, ktol)
                    if B.shape[0] == 0:
                        continue
                    (Ex, Ey, Ez), p, P = _e3_cart(
                        shi.l, shj.l, mi, mj, A, B, a, b)
                    pref = (np.pi / p) ** 1.5
                    Ic = np.empty((len(mi), len(mj)))
                    for ai, (ax, ay, az) in enumerate(mi):
                        for bj, (bx, by, bz) in enumerate(mj):
                            Ic[ai, bj] = pref * np.sum(
                                Ex[ax, bx, 0] * Ey[ay, by, 0]
                                * Ez[az, bz, 0])
                    Is = _sph_contract(Ic, Ci, Cj)
                    blk += np.einsum(
                        "k,l,MN->kMlN", shi.coeffs[ip], shj.coeffs[jp], Is)
            out[ao_loc[ii]:ao_loc[ii + 1], ao_loc[jj]:ao_loc[jj + 1]] = \
                blk.reshape(shi.nao, shj.nao)
    return out


def kinetic(cell, ktol: float = 1e-14) -> np.ndarray:
    """Lattice-summed kinetic matrix -1/2 <mu|lap|nu>, analytic
    (steepness-independent — the all-electron X2C companion of
    :func:`overlap`; the FT path ops/ft_ao needs a converged G-mesh).

    Per-axis derivative reduction on the ket primitive
    d^2/dx^2 [x^j e^{-b x^2}] = j(j-1) x^{j-2} - 2b(2j+1) x^j
    + 4 b^2 x^{j+2}, so the 1D kinetic factor combines ket-shifted 1D
    overlaps E[i, j+-2, 0] (reference operator contract:
    pbc_intor('int1e_kin'), pyscf/pbc/gto/cell.py:1693)."""
    nao = cell.nao
    out = np.zeros((nao, nao))
    ao_loc = cell.ao_loc
    blocks = _shell_norm_blocks(cell)

    def t1d(E, j, b, ax):
        # -1/2 d^2/dx^2 combination of 1D overlaps for ket power j
        val = -2.0 * b * b * E[ax, j + 2, 0]
        val = val + b * (2 * j + 1) * E[ax, j, 0]
        if j >= 2:
            val = val - 0.5 * j * (j - 1) * E[ax, j - 2, 0]
        return val

    for ii, (shi, mi, Ci) in enumerate(blocks):
        A = cell.coords[shi.atom]
        for jj, (shj, mj, Cj) in enumerate(blocks):
            blk = np.zeros((shi.coeffs.shape[1], 2 * shi.l + 1,
                            shj.coeffs.shape[1], 2 * shj.l + 1))
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    B = _bra_images(cell, shi, shj, a, b, ktol)
                    if B.shape[0] == 0:
                        continue
                    # ket angular momenta up to l+2 for the reduction
                    (Ex, Ey, Ez), p, P = _e3_cart(
                        shi.l, shj.l + 2, mi, mj, A, B, a, b)
                    pref = (np.pi / p) ** 1.5
                    Ic = np.empty((len(mi), len(mj)))
                    for ai, (ax, ay, az) in enumerate(mi):
                        for bj, (bx, by, bz) in enumerate(mj):
                            sx = Ex[ax, bx, 0]
                            sy = Ey[ay, by, 0]
                            sz = Ez[az, bz, 0]
                            tx = t1d(Ex, bx, b, ax)
                            ty = t1d(Ey, by, b, ay)
                            tz = t1d(Ez, bz, b, az)
                            Ic[ai, bj] = pref * np.sum(
                                tx * sy * sz + sx * ty * sz + sx * sy * tz)
                    Is = _sph_contract(Ic, Ci, Cj)
                    blk += np.einsum(
                        "k,l,MN->kMlN", shi.coeffs[ip], shj.coeffs[jp], Is)
            out[ao_loc[ii]:ao_loc[ii + 1], ao_loc[jj]:ao_loc[jj + 1]] = \
                blk.reshape(shi.nao, shj.nao)
    return out


def int2c(auxcell, omega, ktol: float = 1e-14) -> np.ndarray:
    """(chi_P | g | chi_Q) two-center Coulomb over the aux basis,
    lattice-summed over Q images (g = erfc(w r)/r, or 1/r if omega None
    — the latter only converges for 0-dimension cells)."""
    naux = auxcell.nao
    out = np.zeros((naux, naux))
    ao_loc = auxcell.ao_loc
    blocks = _shell_norm_blocks(auxcell)
    # omega=None is the molecular (0-dimension) mode: the bare-1/r
    # kernel sum has no absolutely-convergent image expansion, so only
    # the home translation enters
    images = auxcell.lattice_images(
        rcut=_aux_rcut(auxcell, omega)) if omega is not None \
        else np.zeros((1, 3))
    for ii, (shi, mi, Ci) in enumerate(blocks):
        A = auxcell.coords[shi.atom]
        di = {a: _e1d_single(shi.l, a) for a in shi.exps}
        for jj, (shj, mj, Cj) in enumerate(blocks):
            C0 = auxcell.coords[shj.atom]
            dj = {b: _e1d_single(shj.l, b) for b in shj.exps}
            L = shi.l + shj.l
            blk = np.zeros((shi.coeffs.shape[1], 2 * shi.l + 1,
                            shj.coeffs.shape[1], 2 * shj.l + 1))
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    rho = a * b / (a + b)
                    Call = C0[None, :] + images
                    PC = A[None, :] - Call
                    R2 = np.einsum("ti,ti->t", PC, PC)
                    if omega is not None:
                        sel = R2 < _sr_rcut(omega, rho)
                        if not sel.any():
                            continue
                        PC, R2 = PC[sel], R2[sel]
                    F = _kernel_F(L, rho, R2, omega)
                    R = _r_tensor(L, rho, PC, F)
                    pref = 2 * np.pi ** 2.5 / (a * b * np.sqrt(a + b))
                    Ic = np.zeros((len(mi), len(mj)))
                    da, db = di[a], dj[b]
                    for ai, (ax, ay, az) in enumerate(mi):
                        for bj, (bx, by, bz) in enumerate(mj):
                            acc = 0.0
                            for t in range(ax + 1):
                                for u in range(ay + 1):
                                    for v in range(az + 1):
                                        w1 = da[ax, t] * da[ay, u] * da[az, v]
                                        if w1 == 0.0:
                                            continue
                                        for tt in range(bx + 1):
                                            for uu in range(by + 1):
                                                for vv in range(bz + 1):
                                                    w2 = db[bx, tt] * db[by, uu] * db[bz, vv]
                                                    if w2 == 0.0:
                                                        continue
                                                    sgn = (-1.0) ** (tt + uu + vv)
                                                    acc += w1 * w2 * sgn * np.sum(
                                                        R[(t + tt, u + uu, v + vv)])
                            Ic[ai, bj] = pref * acc
                    Is = _sph_contract(Ic, Ci, Cj)
                    blk += np.einsum(
                        "k,l,MN->kMlN", shi.coeffs[ip], shj.coeffs[jp], Is)
            out[ao_loc[ii]:ao_loc[ii + 1], ao_loc[jj]:ao_loc[jj + 1]] = \
                blk.reshape(shi.nao, shj.nao)
    return out


def _aux_rcut(auxcell, omega, bra_cell=None):
    """Real-space image radius for the SR aux lattice sum.

    The erfc range is set by the PAIR-reduced Hermite exponent
    rho = a b/(a+b) (int2c) or p c/(p+c) (int3c), which is as small as
    half the smallest participating exponent — bounding with the raw
    aux minimum truncated contributing images for diffuse even-tempered
    tails (code-review finding). xy/(x+y) >= min(x,y)/2 gives the safe
    bound; the positional offset term covers the full home-cell
    diagonal, not one lattice vector."""
    amin_aux = min(float(sh.exps.min()) for sh in auxcell.shells)
    rho_min = amin_aux
    if bra_cell is not None:
        p_min = 2.0 * min(float(sh.exps.min()) for sh in bra_cell.shells)
        rho_min = min(amin_aux, p_min)
    return float(np.sqrt(_sr_rcut(omega, 0.5 * rho_min))) \
        + float(np.sum(np.linalg.norm(auxcell.a, axis=1)))


def int3c(cell, auxcell, omega, ktol: float = 1e-12) -> np.ndarray:
    """(phi_i phi_j | g | chi_P): 3-center Coulomb, bra pair anchored in
    the home cell (j lattice-summed by overlap decay), aux center
    lattice-summed by the SR kernel decay. Returns (naux, nao, nao)."""
    nao, naux = cell.nao, auxcell.nao
    out = np.zeros((naux, nao, nao))
    ao_loc = cell.ao_loc
    aux_loc = auxcell.ao_loc
    blocks = _shell_norm_blocks(cell)
    aux_blocks = _shell_norm_blocks(auxcell)
    aux_images = auxcell.lattice_images(
        rcut=_aux_rcut(auxcell, omega, bra_cell=cell)) \
        if omega is not None \
        else np.zeros((1, 3))                    # molecular mode

    for ii, (shi, mi, Ci) in enumerate(blocks):
        A = cell.coords[shi.atom]
        for jj, (shj, mj, Cj) in enumerate(blocks):
            if jj > ii:
                continue                      # hermitian in (i,j)
            lt_bra = shi.l + shj.l
            pair_blk = np.zeros((naux,
                                 shi.coeffs.shape[1], 2 * shi.l + 1,
                                 shj.coeffs.shape[1], 2 * shj.l + 1))
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    B = _bra_images(cell, shi, shj, a, b, ktol)
                    if B.shape[0] == 0:
                        continue
                    (Ex, Ey, Ez), p, P = _e3_cart(
                        shi.l, shj.l, mi, mj, A, B, a, b)
                    nt = P.shape[0]
                    for kk, (shP, mP, CP) in enumerate(aux_blocks):
                        C0 = auxcell.coords[shP.atom]
                        for kp, c in enumerate(shP.exps):
                            rho = p * c / (p + c)
                            L = lt_bra + shP.l
                            Call = C0[None, :] + aux_images   # (nc, 3)
                            PC = (P[:, None, :] - Call[None, :, :]).reshape(-1, 3)
                            R2 = np.einsum("xi,xi->x", PC, PC)
                            if omega is not None:
                                sel = R2 < _sr_rcut(omega, rho)
                                if not sel.any():
                                    continue
                            else:
                                sel = slice(None)
                            PCs, R2s = PC[sel], R2[sel]
                            F = _kernel_F(L, rho, R2s, omega)
                            R = _r_tensor(L, rho, PCs, F)
                            # scatter back: sums over aux images per bra
                            # image point
                            if omega is not None:
                                idx = np.nonzero(sel)[0]
                                bra_of = idx // Call.shape[0]
                            else:
                                bra_of = np.repeat(np.arange(nt),
                                                   Call.shape[0])
                            pref = 2 * np.pi ** 2.5 / (p * c * np.sqrt(p + c))
                            dP = _e1d_single(shP.l, c)
                            # ket Hermite weights per aux monomial
                            Ic = np.zeros((len(mP), len(mi), len(mj)))
                            for ai, (ax, ay, az) in enumerate(mi):
                                for bj, (bx, by, bz) in enumerate(mj):
                                    # bra Hermite weights (t,u,v) over nt
                                    for t in range(ax + bx + 1):
                                        wx = Ex[ax, bx, t]      # (nt,)
                                        for u in range(ay + by + 1):
                                            wy = Ey[ay, by, u]
                                            for v in range(az + bz + 1):
                                                wz = Ez[az, bz, v]
                                                wbra = wx * wy * wz
                                                if not np.any(wbra):
                                                    continue
                                                for ci_, (cx, cy, cz) in enumerate(mP):
                                                    for tt in range(cx + 1):
                                                        for uu in range(cy + 1):
                                                            for vv in range(cz + 1):
                                                                w2 = dP[cx, tt] * dP[cy, uu] * dP[cz, vv]
                                                                if w2 == 0.0:
                                                                    continue
                                                                sgn = (-1.0) ** (tt + uu + vv)
                                                                contrib = np.bincount(
                                                                    bra_of,
                                                                    weights=R[(t + tt, u + uu, v + vv)],
                                                                    minlength=nt)
                                                                Ic[ci_, ai, bj] += sgn * w2 * np.sum(
                                                                    wbra * contrib)
                            Ic *= pref
                            # solid-harmonic transforms
                            Isp = np.einsum("Pc,Ma,Nb,cab->PMN",
                                            CP, Ci, Cj, Ic, optimize=True)
                            w_aux = shP.coeffs[kp]   # (nctr_aux,)
                            seg = np.einsum(
                                "q,PMN,k,l->qPkMlN",
                                w_aux, Isp, shi.coeffs[ip], shj.coeffs[jp])
                            # accumulate into (naux-slice, nctr_i, mi, nctr_j, mj)
                            p0 = aux_loc[kk]
                            nm = 2 * shP.l + 1
                            nq = shP.coeffs.shape[1]
                            pair_blk[p0:p0 + nq * nm] += seg.reshape(
                                nq, nm, *seg.shape[2:]).reshape(
                                nq * nm, *seg.shape[2:])
            i0, i1 = ao_loc[ii], ao_loc[ii + 1]
            j0, j1 = ao_loc[jj], ao_loc[jj + 1]
            blk = pair_blk.reshape(naux, shi.nao, shj.nao)
            out[:, i0:i1, j0:j1] = blk
            if jj != ii:
                out[:, j0:j1, i0:i1] = blk.transpose(0, 2, 1)
    return out


def vne(cell, omega, charges=None, ktol: float = 1e-12) -> np.ndarray:
    """Nuclear attraction sum_A -Z_A (phi_i phi_j | g | delta_A),
    lattice-summed. g = erfc(w r)/r (or full 1/r for 0-dim cells)."""
    nao = cell.nao
    Z = np.asarray(cell.charges if charges is None else charges,
                   dtype=np.float64)
    out = np.zeros((nao, nao))
    ao_loc = cell.ao_loc
    blocks = _shell_norm_blocks(cell)
    if omega is not None:
        nuc_images = cell.lattice_images(rcut=_nuc_rcut(cell, omega))
    else:
        nuc_images = np.zeros((1, 3))            # molecular mode
    # all nucleus positions x images
    Cn = (cell.coords[:, None, :] + nuc_images[None, :, :]).reshape(-1, 3)
    Zn = np.repeat(Z, nuc_images.shape[0])

    for ii, (shi, mi, Ci) in enumerate(blocks):
        A = cell.coords[shi.atom]
        for jj, (shj, mj, Cj) in enumerate(blocks):
            if jj > ii:
                continue
            blk = np.zeros((shi.coeffs.shape[1], 2 * shi.l + 1,
                            shj.coeffs.shape[1], 2 * shj.l + 1))
            L = shi.l + shj.l
            for ip, a in enumerate(shi.exps):
                for jp, b in enumerate(shj.exps):
                    B = _bra_images(cell, shi, shj, a, b, ktol)
                    if B.shape[0] == 0:
                        continue
                    (Ex, Ey, Ez), p, P = _e3_cart(
                        shi.l, shj.l, mi, mj, A, B, a, b)
                    nt = P.shape[0]
                    PC = (P[:, None, :] - Cn[None, :, :]).reshape(-1, 3)
                    R2 = np.einsum("xi,xi->x", PC, PC)
                    if omega is not None:
                        sel = R2 < _sr_rcut(omega, p)
                        if not sel.any():
                            continue
                    else:
                        sel = slice(None)
                    PCs, R2s = PC[sel], R2[sel]
                    F = _kernel_F(L, p, R2s, omega)
                    R = _r_tensor(L, p, PCs, F)
                    if omega is not None:
                        idx = np.nonzero(sel)[0]
                        bra_of = idx // Cn.shape[0]
                        z_of = Zn[idx % Cn.shape[0]]
                    else:
                        bra_of = np.repeat(np.arange(nt), Cn.shape[0])
                        z_of = np.tile(Zn, nt)
                    pref = 2 * np.pi / p
                    Ic = np.zeros((len(mi), len(mj)))
                    for ai, (ax, ay, az) in enumerate(mi):
                        for bj, (bx, by, bz) in enumerate(mj):
                            for t in range(ax + bx + 1):
                                wx = Ex[ax, bx, t]
                                for u in range(ay + by + 1):
                                    wy = Ey[ay, by, u]
                                    for v in range(az + bz + 1):
                                        wz = Ez[az, bz, v]
                                        wbra = wx * wy * wz
                                        if not np.any(wbra):
                                            continue
                                        contrib = np.bincount(
                                            bra_of,
                                            weights=z_of * R[(t, u, v)],
                                            minlength=nt)
                                        Ic[ai, bj] += np.sum(wbra * contrib)
                    Ic *= -pref
                    Is = _sph_contract(Ic, Ci, Cj)
                    blk += np.einsum("k,l,MN->kMlN",
                                     shi.coeffs[ip], shj.coeffs[jp], Is)
            i0, i1 = ao_loc[ii], ao_loc[ii + 1]
            j0, j1 = ao_loc[jj], ao_loc[jj + 1]
            b2 = blk.reshape(shi.nao, shj.nao)
            out[i0:i1, j0:j1] = b2
            if jj != ii:
                out[j0:j1, i0:i1] = b2.T
    return out


def _nuc_rcut(cell, omega):
    amin = min(float(sh.exps.min()) for sh in cell.shells)
    return float(np.sqrt(_sr_rcut(omega, amin))) \
        + float(np.max(np.linalg.norm(cell.a, axis=1)))


def int2e_molecular(cell) -> np.ndarray:
    """Exact 4-center ERIs (ij|kl), chemist notation, for 0-dimension
    cells (molecules). Full 1/r kernel, no lattice images. The anchor
    path: validates Boys/E/R/solid-harmonic assembly end to end against
    textbook molecular RHF energies."""
    nao = cell.nao
    out = np.zeros((nao, nao, nao, nao))
    ao_loc = cell.ao_loc
    blocks = _shell_norm_blocks(cell)
    # precompute bra/ket primitive-pair Hermite data per shell pair
    for ii, (shi, mi, Ci) in enumerate(blocks):
        A = cell.coords[shi.atom]
        for jj, (shj, mj, Cj) in enumerate(blocks):
            B = cell.coords[shj.atom][None, :]
            for kk, (shk, mk, Ck) in enumerate(blocks):
                Cc = cell.coords[shk.atom]
                for ll, (shl, ml, Cl) in enumerate(blocks):
                    D = cell.coords[shl.atom][None, :]
                    blk = np.zeros((shi.coeffs.shape[1], 2 * shi.l + 1,
                                    shj.coeffs.shape[1], 2 * shj.l + 1,
                                    shk.coeffs.shape[1], 2 * shk.l + 1,
                                    shl.coeffs.shape[1], 2 * shl.l + 1))
                    L = shi.l + shj.l + shk.l + shl.l
                    for ip, a in enumerate(shi.exps):
                        for jp, b in enumerate(shj.exps):
                            (Ex, Ey, Ez), p, P = _e3_cart(
                                shi.l, shj.l, mi, mj, A, B, a, b)
                            for kp, c in enumerate(shk.exps):
                                for lp, d in enumerate(shl.exps):
                                    (Fx, Fy, Fz), q, Q = _e3_cart(
                                        shk.l, shl.l, mk, ml, Cc, D, c, d)
                                    rho = p * q / (p + q)
                                    PQ = P - Q
                                    R2 = np.einsum("xi,xi->x", PQ, PQ)
                                    Ftab = _kernel_F(L, rho, R2, None)
                                    R = _r_tensor(L, rho, PQ, Ftab)
                                    pref = 2 * np.pi ** 2.5 \
                                        / (p * q * np.sqrt(p + q))
                                    Ic = np.zeros((len(mi), len(mj),
                                                   len(mk), len(ml)))
                                    for ai, (ax, ay, az) in enumerate(mi):
                                        for bj, (bx, by, bz) in enumerate(mj):
                                            for t in range(ax + bx + 1):
                                                for u in range(ay + by + 1):
                                                    for v in range(az + bz + 1):
                                                        w1 = Ex[ax, bx, t] * Ey[ay, by, u] * Ez[az, bz, v]
                                                        if not np.any(w1):
                                                            continue
                                                        for ck, (cx, cy, cz) in enumerate(mk):
                                                            for dl, (dx, dy, dz) in enumerate(ml):
                                                                Ic[ai, bj, ck, dl] += _ket_accum(
                                                                    Fx, Fy, Fz, cx, cy, cz,
                                                                    dx, dy, dz, t, u, v, R) * float(w1[0])
                                    Ic *= pref
                                    Isp = np.einsum(
                                        "Ma,Nb,Kc,Ld,abcd->MNKL",
                                        Ci, Cj, Ck, Cl, Ic, optimize=True)
                                    blk += np.einsum(
                                        "m,n,k,l,MNKL->mMnNkKlL",
                                        shi.coeffs[ip], shj.coeffs[jp],
                                        shk.coeffs[kp], shl.coeffs[lp],
                                        Isp, optimize=True)
                    out[ao_loc[ii]:ao_loc[ii + 1],
                        ao_loc[jj]:ao_loc[jj + 1],
                        ao_loc[kk]:ao_loc[kk + 1],
                        ao_loc[ll]:ao_loc[ll + 1]] = blk.reshape(
                        shi.nao, shj.nao, shk.nao, shl.nao)
    return out


def _ket_accum(Fx, Fy, Fz, cx, cy, cz, dx, dy, dz, t, u, v, R):
    acc = 0.0
    for tt in range(cx + dx + 1):
        for uu in range(cy + dy + 1):
            for vv in range(cz + dz + 1):
                w2 = Fx[cx, dx, tt] * Fy[cy, dy, uu] * Fz[cz, dz, vv]
                if not np.any(w2):
                    continue
                acc += ((-1.0) ** (tt + uu + vv)) * float(w2[0]) \
                    * float(R[(t + tt, u + uu, v + vv)][0])
    return acc
