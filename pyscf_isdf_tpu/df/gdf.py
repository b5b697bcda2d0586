"""Gaussian density fitting (GDF) built in G-space on device.

The reference's GDF (pyscf/pbc/df/df.py:127, builders gdf_builder.py:48 /
rsdf_builder.py:59) assembles 3-center integrals with libcint C kernels
(fill_ints.c) plus charge compensation, cached to HDF5. The TPU-native
redesign needs neither: the Coulomb-metric fit is assembled directly in
G-space —

    j2c[P,Q]  = 1/vol sum_G  chi_P*(G) v(G) chi_Q(G)
    j3c[P,ij] = 1/vol sum_G  chi_P*(G) v(G) rho_ij(G)

with BOTH chi_P and rho_ij collocated on the SCF grid and FFT'd on
device (batched FFTs, no integral library). Representation consistency
matters: the aux FTs must live in the same (mesh-truncated, aliased)
space as the grid pair densities, or the fit bottoms out at the
aliasing mismatch instead of the fitting residual — collocating both
makes the fitted ERI exactly the Coulomb-metric projection of the
FFTDF ERI onto the auxiliary span. v is the SCF Coulomb kernel
(coulG, G=0 -> 0), matching FFTDF's exxdiv seam.

The auxiliary basis is an even-tempered product expansion
(reference pyscf/df/addons.py aug_etb semantics, re-derived).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df.fftdf import fft3


def aug_etb_spec(cell, beta: float = 2.0, l_extra: int = 2):
    """Even-tempered auxiliary basis spec per element.

    For each element, the product densities phi_i phi_j have exponents
    a_i + a_j and angular momenta |l_i - l_j| .. l_i + l_j; per aux l the
    exponent range is spanned by a geometric progression of ratio beta.

    TWO-center products are off-center relative to either atom, so their
    multipole expansion about the atomic centers extends beyond l1+l2:
    ``l_extra`` additional higher-l shells over the diffuse..mid exponent
    range restore the fit (diamond szv two-center ERI error drops
    6.8e-4 -> 1.9e-7 at l_extra=2; measured in tests/test_gdf.py).
    Returns {symbol: [[l, (exp, 1.0)], ...]}.
    """
    spec = {}
    by_symbol: dict[str, list] = {}
    for sh in cell.shells:
        by_symbol.setdefault(cell.symbols[sh.atom], []).append(sh)
    for sym, shells in by_symbol.items():
        emin: dict[int, float] = {}
        emax: dict[int, float] = {}
        for shi in shells:
            for shj in shells:
                for l in range(abs(shi.l - shj.l), shi.l + shj.l + 1):
                    lo = float(shi.exps.min() + shj.exps.min())
                    hi = float(shi.exps.max() + shj.exps.max())
                    emin[l] = min(emin.get(l, lo), lo)
                    emax[l] = max(emax.get(l, hi), hi)
        funcs = []
        for l in sorted(emin):
            n = max(1, int(np.ceil(np.log(emax[l] / emin[l])
                                   / np.log(beta))) + 1)
            exps = emin[l] * beta ** np.arange(n)
            for e in exps:
                funcs.append([l, (float(e), 1.0)])
        lmax = max(emin)
        lo = min(emin.values())
        hi = np.sqrt(lo * max(emax.values()))     # diffuse..mid range
        n = max(1, int(np.ceil(np.log(hi / lo) / np.log(beta))) + 1)
        for l in range(lmax + 1, lmax + 1 + l_extra):
            for e in lo * beta ** np.arange(n):
                funcs.append([l, (float(e), 1.0)])
        spec[sym] = funcs
    return spec


def make_auxcell(cell, beta: float = 2.0, l_extra: int = 2):
    from pyscf_isdf_tpu.cell import build_cell

    atoms = [[s, tuple(c)] for s, c in zip(cell.symbols, cell.coords)]
    return build_cell(cell.a, atoms,
                      aug_etb_spec(cell, beta=beta, l_extra=l_extra),
                      pseudo=None, mesh=tuple(cell.mesh), unit="Bohr")


@dataclass(frozen=True, eq=False)
class GDF:
    cderi: jnp.ndarray     # (naux_kept, nao, nao) whitened 3c tensor
    naux: int


@partial(jax.jit, static_argnames=("mesh", "chunk"))
def _pair_ft(aoR, coulG, mesh, weight, chunk: int = 16):
    """v-weighted AO-pair Fourier transforms: (ng, nao, nao) complex
    v(G) rho_ij(G), rho from grid collocation (batched device FFT)."""
    ng, nao = aoR.shape
    pairs = (aoR[:, :, None] * aoR[:, None, :]).reshape(ng, nao * nao).T

    def block(p):
        return coulG[None, :] * fft3(p.astype(jnp.complex128), mesh) * weight

    npair = nao * nao
    npad = (-npair) % chunk
    p = jnp.pad(pairs, ((0, npad), (0, 0)))
    out = jax.lax.map(block, p.reshape(-1, chunk, ng))
    return out.reshape(-1, ng)[:npair]          # (nao^2, ng)


def build_gdf(cell, aoR, coulG, mesh, weight, beta: float = 2.0,
              l_extra: int = 2, lindep: float = 1e-10, aoR_aux=None) -> GDF:
    """Assemble the whitened fit tensor cderi = j2c^{-1/2} j3c."""
    from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy

    nao = aoR.shape[1]
    if aoR_aux is None:
        auxcell = make_auxcell(cell, beta=beta, l_extra=l_extra)
        aoR_aux = eval_ao_numpy(auxcell)
    aoR_aux = jnp.asarray(aoR_aux, dtype=aoR.dtype)

    coulG_j = jnp.asarray(coulG)
    # grid-consistent aux FTs: chi_P(G) = w * fft(aux_P on grid)
    chi_j = fft3(aoR_aux.T.astype(jnp.complex128),
                 tuple(mesh)).T * weight                 # (ng, naux)
    vchi = coulG_j[:, None] * chi_j
    j2c = np.asarray(jnp.real(chi_j.conj().T @ vchi)) / cell.vol

    vpair = _pair_ft(jnp.asarray(aoR), coulG_j, tuple(mesh), weight)
    # j3c[P, ij] = 1/vol sum_G chi_P*(G) [v rho_ij](G)
    j3c = np.asarray(jnp.real(vpair @ chi_j.conj())).T / cell.vol

    w, U = np.linalg.eigh(j2c)
    keep = w > w.max() * lindep
    # whitening: cderi = diag(w^-1/2) U^T j3c  =>  ERI = cderi^T cderi
    cd = (U[:, keep] / np.sqrt(w[keep])).T @ j3c
    return GDF(cderi=jnp.asarray(cd.reshape(-1, nao, nao)),
               naux=int(keep.sum()))


@jax.jit
def _get_jk_cd(cd, dm):
    rho = jnp.einsum("pij,ji->p", cd, dm)
    vj = jnp.einsum("p,pij->ij", rho, cd)
    t = jnp.einsum("pik,kl->pil", cd, dm)
    vk = jnp.einsum("pil,plj->ij", t, cd)
    return vj, vk


def get_jk(gdf: GDF, dm):
    return _get_jk_cd(gdf.cderi, dm)


def get_eri(gdf: GDF):
    """(nao^2, nao^2) fitted ERIs (ij|kl) = sum_P cd_P,ij cd_P,kl."""
    cd = gdf.cderi
    nao = cd.shape[1]
    flat = cd.reshape(gdf.cderi.shape[0], nao * nao)
    return np.asarray(flat.T @ flat)


# ------------------------------------------------------------------ k-point
@dataclass(frozen=True, eq=False)
class KGDF:
    """Per-(k1,k2) whitened fit tensors cd[k1][k2] = (naux_q, nao, nao)
    for the momentum-q = k2-k1 pair space (reference GDF's k-point
    _cderi; built in G-space on the grid, no libcint)."""

    cd: tuple          # cd[k1][k2]: jnp (naux_q, nao, nao) complex
    nk: int


def build_gdf_kpts(cell, aoR_k, kpts, mesh, weight, beta: float = 2.0,
                   l_extra: int = 2, lindep: float = 1e-10,
                   omega=None) -> KGDF:
    """k-point GDF build: for every (k1, k2) the pair densities
    conj(ao_k1) ao_k2 e^{-iqr} (q = k2-k1) are fit in the Coulomb metric
    of v_q = coulG(q) (wrap-around included) against the q-boosted
    auxiliary functions aux_P e^{iqr} — all FTs are batched device FFTs
    of grid-collocated functions, representation-consistent with
    fftdf_k (cf. the Gamma builder's docstring)."""
    from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
    from pyscf_isdf_tpu.ops import coulomb

    kpts = np.reshape(kpts, (-1, 3))
    nk = len(kpts)
    nao = aoR_k.shape[2]
    mesh = tuple(mesh)
    auxcell = make_auxcell(cell, beta=beta, l_extra=l_extra)
    aoR_aux = jnp.asarray(eval_ao_numpy(auxcell), dtype=jnp.complex128)
    coords = cell.uniform_grid()
    # the q-boosted aux chi_P e^{iqr} has PLAIN periodic part chi_P —
    # its FT is q-independent; only the metric v(q+G) varies with q
    chi = fft3(aoR_aux.T, mesh).T * weight              # (ng, naux)

    cache = {}
    b_mat = 2.0 * np.pi * np.linalg.inv(cell.a.T)

    def q_data(q):
        # canonicalize q modulo the reciprocal lattice: pairs (k1,k2)
        # and (k2,k1) on a half-BZ mesh carry q = +X and -X = X - G —
        # the SAME momentum-transfer class. One whitened aux basis per
        # class is load-bearing for consumers that STACK pair tensors
        # across ki at fixed transfer (gw/krgw.py's polarizability):
        # mixing two eigh whitenings of the same metric in one Pi
        # matrix is frame-inconsistent (caught by the GW supercell
        # parity test). The G-shifted phase e^{-i q_c r} stays
        # lattice-periodic, so the fit itself is unchanged in quality.
        scaled = (q @ cell.a.T) / (2.0 * np.pi)
        frac = scaled - np.floor(scaled + 0.5 - 1e-9)   # [-0.5, 0.5)
        q_c = frac @ b_mat
        key = tuple(np.round(frac, 10))
        if key not in cache:
            phase = jnp.asarray(np.exp(-1j * coords @ q_c))
            vq = jnp.asarray(coulomb.get_coulG(cell, k=q_c, exxdiv=None,
                                               kpts=kpts, omega=omega))
            j2c = np.asarray(chi.conj().T @ (vq[:, None] * chi)) / cell.vol
            w, U = np.linalg.eigh(j2c)
            keep = w > w.max() * lindep
            wh = (U[:, keep] / np.sqrt(w[keep])).conj().T   # (nkeep, naux)
            cache[key] = (vq, jnp.asarray(wh), phase)
        return cache[key]

    cd = []
    for k1 in range(nk):
        row = []
        for k2 in range(nk):
            q = kpts[k2] - kpts[k1]
            vq, wh, phase = q_data(q)
            ao1 = aoR_k[k1]
            ao2 = aoR_k[k2]
            pair = (ao1.conj()[:, :, None] * ao2[:, None, :]) \
                * phase[:, None, None]
            pflat = pair.reshape(-1, nao * nao).T            # (nao^2, ng)
            # j3c[P, mn] = (1/vol) sum_G conj(chi_P) v_q rho_mn;
            # chunked FFTs bound the transient workspace (same memory
            # posture as the Gamma builder's _pair_ft)
            chunk = 16
            npair = nao * nao
            npad = (-npair) % chunk
            p_p = jnp.pad(pflat, ((0, npad), (0, 0)))

            def _block(p):
                pG = fft3(p, mesh) * weight
                return (vq[None, :] * pG) @ chi.conj()       # (chunk, naux)

            j3c_t = jax.lax.map(
                _block, p_p.reshape(-1, chunk, pflat.shape[1]))
            j3c = j3c_t.reshape(-1, chi.shape[1])[:npair].T / cell.vol
            row.append((wh @ j3c).reshape(-1, nao, nao))
        cd.append(row)
    return KGDF(cd=tuple(tuple(r) for r in cd), nk=nk)


def get_jk_kpts(kgdf: KGDF, dm_k):
    """J/K matrices at every k from the k-point fit.

    K^{k1} = (1/nk) sum_{k2,P} cd^{k1k2}_P D^{k2} cd^{k1k2 H}_P;
    J^{k1}_{mn} = sum_P conj(cd^{k1k1}_{P,mn}) rho_P with
    rho_P = (1/nk) sum_k2 sum_mn cd^{k2k2}_{P,mn} D^{k2}_{nm}.

    Conjugation placement matters for PHASE INVARIANCE: the whitening
    eigenvectors of the complex q=0 j2c carry arbitrary per-column
    phases (and arbitrary rotations inside degenerate aux-metric
    eigenspaces). Under cd_P -> e^{-i theta_P} cd_P the density
    coefficient rho_P -> e^{-i theta_P} rho_P, so vj is invariant only
    when the OUTER factor is conjugated — contracting cd twice without
    a conjugation is O(1) wrong whenever eigh returns complex-mixed
    vectors (caught by code review; regression-tested with an explicit
    degenerate-phase scramble in test_gdf).
    """
    nk = kgdf.nk
    dm_k = [jnp.asarray(d) for d in dm_k]
    rho = 0.0
    for k2 in range(nk):
        rho = rho + jnp.einsum("pmn,nm->p", kgdf.cd[k2][k2],
                               dm_k[k2]) / nk
    vj, vk = [], []
    for k1 in range(nk):
        # vj_mn = <pair_nm, rho>_v  (conj(pair_mn) = pair_nm): the
        # conjugated factor carries TRANSPOSED pair indices
        vj.append(jnp.einsum("p,pnm->mn", rho, kgdf.cd[k1][k1].conj()))
        acc = 0.0
        for k2 in range(nk):
            c = kgdf.cd[k1][k2]
            t = jnp.einsum("pmn,nl->pml", c, dm_k[k2])
            acc = acc + jnp.einsum("pml,pkl->mk", t, c.conj()) / nk
        vk.append(acc)
    return jnp.stack(vj), jnp.stack(vk)
