"""Becke atomic-grid quadrature for periodic XC integration.

Reference counterpart: ``pyscf/pbc/dft/gen_grid.py:141-234`` (BeckeGrids,
which replicates atoms into a supercell, keeps the grid points that land
inside the unit cell, and Becke-weights them) built on the molecular
machinery in ``pyscf/dft/radi.py`` / ``pyscf/dft/gen_grid.py`` (tabulated
Lebedev point sets via ``MakeAngularGrid``).

TPU-first redesign — same capability, different construction:

* **Periodic partition identity instead of point wrapping.**  For a
  cell-periodic integrand ``f`` and a Becke partition of unity over the
  crystal (``sum_{A in cell} sum_T P_{A,T}(r) = 1``),

      integral_cell f  =  sum_{A in cell}  integral_{R^3} P_A(r) f(r) dr

  so each atom carries one all-space atomic grid and nothing is ever
  wrapped into or filtered against the unit cell.  (Consistency check:
  the weights of the full grid sum to the cell volume.)

* **Compactly supported partition.**  The raw Becke cell function has an
  ``(r_cov / r)^8`` tail (k=3 iterations), so truncating each atomic grid
  at a radius would break the identity at the 1e-3 level.  Instead each
  atom's unnormalized weight is multiplied by a smooth radial cutoff
  ``h_A(|r - R_A|)`` (1 inside ``r1``, cosine ramp to 0 at ``r_cut``)
  BEFORE normalization:  ``P_A = h_A prod_s / sum_B h_B prod_s``.  Any
  translation-covariant nonnegative weight set that covers the crystal
  yields an exact partition of unity, so the identity holds exactly while
  every atomic integrand is now compactly supported inside ``r_cut`` —
  the quadrature error is pure radial x angular resolution.

* **Algorithmic product angular grids** (Gauss-Legendre in cos(theta)
  x uniform in phi), exact for spherical harmonics up to degree
  ``2*n_theta - 1`` — instead of tabulated Lebedev octahedral sets.
  ~1.5-2x more points for the same degree, which on the MXU is free:
  every downstream contraction is a dense (ngrid, nao) matmul and the
  point count only scales its contraction dimension.

* **One STATIC point cloud.**  The grid is built once per geometry on the
  host (float64), pruned (points whose Becke weight is numerically zero
  in the crystal are dropped), and shipped to the device with a fixed
  shape — every SCF cycle then runs identical dense XLA programs.

* **AO gradients by autodiff.**  GGA/mGGA need d(AO)/dr at the grid
  points; three ``jax.jvp`` pushes through the jitted lattice-summed AO
  evaluator (``ops/ao_eval.eval_ao``) replace the reference's hand-coded
  GTOval_sph_deriv1 kernels.

The uniform FFT mesh remains the production quadrature (BECKE_GRIDS.md
records the measured convergence study); Becke grids are the opt-in
all-electron XC quadrature (``xc_grids='becke'``) that clusters points at
nuclear cusps, exactly the reference's use of BeckeGrids with FFTDF.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_isdf_tpu import lattice
from pyscf_isdf_tpu.ops.ao_eval import PackedBasis, eval_ao

__all__ = [
    "BeckeGrids", "build_becke_grids", "eval_ao_and_grad",
    "vxc_lda", "vxc_gga", "vxc_mgga",
]

BOHR = 0.52917721092

# Bragg-Slater atomic radii (Angstrom; J. C. Slater, J. Chem. Phys. 41,
# 3199 (1964) — published data, same table the reference ships in
# pyscf/dft/radi.py).  Noble gases take the customary filled values.
_BRAGG_A = {
    "H": 0.35, "He": 1.40,
    "Li": 1.45, "Be": 1.05, "B": 0.85, "C": 0.70, "N": 0.65,
    "O": 0.60, "F": 0.50, "Ne": 1.50,
    "Na": 1.80, "Mg": 1.50, "Al": 1.25, "Si": 1.10, "P": 1.00,
    "S": 1.00, "Cl": 1.00, "Ar": 1.88,
    "K": 2.20, "Ca": 1.80, "Sc": 1.60, "Ti": 1.40, "V": 1.35,
    "Cr": 1.40, "Mn": 1.40, "Fe": 1.40, "Co": 1.35, "Ni": 1.35,
    "Cu": 1.35, "Zn": 1.35, "Ga": 1.30, "Ge": 1.25, "As": 1.15,
    "Se": 1.15, "Br": 1.15, "Kr": 2.02,
}


def bragg_radius(symbol: str) -> float:
    """Bragg-Slater radius in bohr (defaults to carbon-like 0.7 A)."""
    return _BRAGG_A.get(symbol, 0.70) / BOHR


# ------------------------------------------------------------------ radial
def treutler_ahlrichs(n: int, xi: float):
    """Treutler-Ahlrichs M4 radial grid on Gauss-Chebyshev-2 nodes.

    Maps x in (-1, 1) to r in (0, inf) via
        r = (xi / ln 2) * (1 + x)^0.6 * ln(2 / (1 - x))
    (Treutler & Ahlrichs, JCP 102, 346 (1995)).  Returns (r, w) with w
    including the r^2 volume factor, so  integral_0^inf f(r) r^2 dr
    ~= sum_i w_i f(r_i).
    """
    i = np.arange(1, n + 1, dtype=np.float64)
    th = i * np.pi / (n + 1)
    x = np.cos(th)
    ln2 = np.log(2.0)
    lg = np.log(2.0 / (1.0 - x))
    r = (xi / ln2) * (1.0 + x) ** 0.6 * lg
    drdx = (xi / ln2) * ((0.6 * (1.0 + x) ** -0.4) * lg
                         + (1.0 + x) ** 0.6 / (1.0 - x))
    # plain dx quadrature from GC2: sum (pi/(n+1)) sin(th) f(cos th)
    w = (np.pi / (n + 1)) * np.sin(th) * drdx * r * r
    return r, w


# ----------------------------------------------------------------- angular
def angular_product(n_theta: int):
    """Product angular grid: Gauss-Legendre in cos(theta) x uniform phi.

    ``n_theta`` GL nodes and ``2 * n_theta`` azimuthal points integrate
    every spherical harmonic of degree < 2 * n_theta exactly.  Returns
    (unit_vectors (nang, 3), weights (nang,)) with sum(weights) = 4 pi.
    """
    ct, wt = np.polynomial.legendre.leggauss(n_theta)
    st = np.sqrt(1.0 - ct * ct)
    m = 2 * n_theta
    phi = 2.0 * np.pi * np.arange(m) / m
    cp, sp = np.cos(phi), np.sin(phi)
    vec = np.stack([
        np.outer(st, cp).ravel(),
        np.outer(st, sp).ravel(),
        np.repeat(ct, m),
    ], axis=1)
    w = np.repeat(wt, m) * (2.0 * np.pi / m)
    return vec, w


# ---------------------------------------------------------------- partition
def _becke_s(mu, k: int = 3):
    """Becke cell step function s(mu) = (1 - f_k(mu)) / 2, f iterated k x."""
    f = mu
    for _ in range(k):
        f = 0.5 * f * (3.0 - f * f)
    return 0.5 * (1.0 - f)


def _radial_mask(d, r1, r_cut):
    """Smooth compact cutoff: 1 for d<=r1, C^3 smoothstep down, 0 past
    r_cut (order-7 polynomial smoothstep: three vanishing derivatives at
    both ends, so the partitioned integrand stays angularly smooth)."""
    t = jnp.clip((d - r1) / (r_cut - r1), 0.0, 1.0)
    t2 = t * t
    t4 = t2 * t2
    return 1.0 - t4 * (35.0 - 84.0 * t + 70.0 * t2 - 20.0 * t2 * t)


@partial(jax.jit, static_argnames=("ia", "chunk"))
def _partition(points, atoms, inv_dist, adjust, pair_on, r1, r_cut,
               ia: int, chunk: int = 256):
    """Normalized compact Becke weight P_A(r) of owner ``ia`` per point.

    points (m, 3); atoms (nB, 3) = every atom (cell + images) within reach
    of this atom's grid; inv_dist (nB, nB) 1/|R_B - R_C| (0 diagonal);
    adjust (nB, nB) the Becke size-adjustment coefficients; pair_on
    (nB, nB) the covariant s-partner mask (1 where |R_B - R_C| <= R_s,
    the SAME radius for every atom — translation covariance of the
    unnormalized weights is what makes the cell-integral identity exact).
    Each atom's raw product is further masked by the smooth compact
    cutoff ``h_B(d_B)`` before normalization (module docstring), so every
    P_A is supported inside ``r_cut``.  The O(m nB^2) pair sweep is one
    fused XLA program (compute-bound, MXU/VPU friendly) scanned over
    fixed-size point chunks.
    """
    m = points.shape[0]
    npad = (-m) % chunk
    pts = jnp.pad(points, ((0, npad), (0, 0))).reshape(-1, chunk, 3)

    def one(pc):
        d = jnp.linalg.norm(pc[:, None, :] - atoms[None, :, :], axis=2)
        mu = (d[:, :, None] - d[:, None, :]) * inv_dist[None, :, :]
        mu = mu + adjust[None, :, :] * (1.0 - mu * mu)
        # off-list (and self) pairs contribute a factor of exactly 1
        s = _becke_s(mu) * pair_on + (1.0 - pair_on)
        p = jnp.prod(s, axis=2) * _radial_mask(d, r1, r_cut)  # (chunk, nB)
        return p[:, ia] / jnp.maximum(p.sum(axis=1), 1e-300)

    return jax.lax.map(one, pts).ravel()[:m]


@dataclass(frozen=True)
class BeckeGrids:
    """Static Becke point cloud: host float64 coords/weights."""
    coords: np.ndarray    # (ng, 3)
    weights: np.ndarray   # (ng,)

    @property
    def size(self) -> int:
        return int(self.coords.shape[0])


def build_becke_grids(cell, n_rad: int = 50, n_theta: int = 12,
                      r_cut: float | None = None,
                      s_radius: float | None = None,
                      prune_tol: float = 1e-12,
                      chunk: int = 256) -> BeckeGrids:
    """Build the periodic Becke quadrature for ``cell`` (float64).

    Per-atom Treutler-Ahlrichs x product-angular grids, partitioned with
    the compactly supported Becke weights (module docstring).  ``r_cut``
    (default: 2x the largest nearest-neighbor distance) is the support
    radius of each atom's partition function and ``s_radius`` (default:
    r_cut) the covariant s-product partner radius — the identity stays
    exact for ANY choice above the crystal's covering radius; the radii
    only control how smoothly the integrand is split among atoms.  The
    neighbor list keeps every image whose compact weight can be nonzero
    at the owner's points (2 r_cut) plus s_radius of s-product partners;
    points with negligible partition weight are pruned — the shipped
    cloud is compact and static.  Validated by the quadrature-exactness
    tests (tests/test_becke.py: lattice-summed Gaussians and
    weight-sum == cell volume).
    """
    a = np.asarray(cell.a, dtype=np.float64)
    natm = cell.natm
    radii = np.array([bragg_radius(s) for s in cell.symbols])

    # nearest-neighbor distance per home atom (images included)
    imgs_nn = lattice.lattice_images(a, float(np.linalg.norm(a, axis=1).max()))
    all_nn = (cell.coords[None, :, :] + imgs_nn[:, None, :]).reshape(-1, 3)
    nn = np.empty(natm)
    for ia in range(natm):
        d = np.linalg.norm(all_nn - cell.coords[ia], axis=1)
        nn[ia] = d[d > 1e-8].min()
    if r_cut is None:
        r_cut = 2.0 * float(nn.max())
    if s_radius is None:
        s_radius = float(r_cut)
    # inner plateau of the compact mask; must exceed the covering radius
    # so every point of space keeps at least one h_B == 1 (nn.max() does:
    # the covering radius of an atomic crystal is below the largest
    # nearest-neighbor distance)
    r1 = 0.5 * r_cut

    # Becke's heteronuclear size adjustment: nu = mu + a_adj (1 - mu^2),
    # a_adj = clip(u / (u^2 - 1), +-0.45), u = (chi - 1)/(chi + 1)
    r_list = 2.0 * r_cut + s_radius
    imgs = lattice.lattice_images(a, r_list)
    atoms_img = (cell.coords[None, :, :] + imgs[:, None, :]).reshape(-1, 3)
    radii_img = np.tile(radii, len(imgs))
    home0 = int(np.argmin(np.linalg.norm(imgs, axis=1))) * natm

    ang_vec, ang_w = angular_product(n_theta)
    coords_out, w_out = [], []
    for ia in range(natm):
        xi = max(radii[ia], 0.4)
        r, wr = treutler_ahlrichs(n_rad, xi)
        keep_r = r <= r_cut
        r, wr = r[keep_r], wr[keep_r]
        pts = (cell.coords[ia][None, None, :]
               + r[:, None, None] * ang_vec[None, :, :]).reshape(-1, 3)
        w0 = (wr[:, None] * ang_w[None, :]).ravel()

        # static per-atom neighbor list (all possible normalizer atoms
        # within 2 r_cut of the owner, plus s-product partners)
        sel = np.linalg.norm(atoms_img - cell.coords[ia], axis=1) <= r_list
        sel[home0 + ia] = True
        idx = np.where(sel)[0]
        B, rB = atoms_img[idx], radii_img[idx]
        ihome = int(np.searchsorted(idx, home0 + ia))
        dist = np.linalg.norm(B[:, None, :] - B[None, :, :], axis=2)
        np.fill_diagonal(dist, 1.0)
        inv_dist = 1.0 / dist
        np.fill_diagonal(inv_dist, 0.0)
        chi = rB[:, None] / rB[None, :]
        u = (chi - 1.0) / (chi + 1.0)
        adjust = np.clip(u / (u * u - 1.0), -0.45, 0.45)
        np.fill_diagonal(adjust, 0.0)
        pair_on = (dist <= s_radius).astype(np.float64)
        np.fill_diagonal(pair_on, 0.0)

        pw = np.asarray(_partition(
            jnp.asarray(pts), jnp.asarray(B), jnp.asarray(inv_dist),
            jnp.asarray(adjust), jnp.asarray(pair_on),
            r1, r_cut, ihome, chunk))
        w = w0 * pw
        keep = pw > prune_tol
        coords_out.append(pts[keep])
        w_out.append(w[keep])
    return BeckeGrids(coords=np.concatenate(coords_out),
                      weights=np.concatenate(w_out))


# --------------------------------------------------------- AO on the cloud
def eval_ao_and_grad(cell, coords, kpt=None, dtype=None, need_grad=True):
    """Periodic AO values (ng, nao) and gradients (3, ng, nao) on a cloud.

    Gradients come from three ``jax.jvp`` pushes through the jitted
    lattice-image AO evaluator — each grid row depends only on its own
    coordinate, so the directional derivative along a broadcast unit
    tangent IS the per-point spatial gradient (the autodiff replacement
    for the reference's GTOval_sph_deriv1).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    packed = PackedBasis.from_cell(cell)
    images = jnp.asarray(cell.lattice_images(), dtype=dtype)
    c = jnp.asarray(np.asarray(coords), dtype=dtype)
    kj = None if kpt is None else jnp.asarray(kpt, dtype=dtype)

    def f(x):
        return eval_ao(packed, x, images, kj)

    ao = f(c)[: c.shape[0]]
    if not need_grad:
        return ao, None
    grads = []
    for x in range(3):
        tang = jnp.zeros_like(c).at[:, x].set(1.0)
        _, g = jax.jvp(f, (c,), (tang,))
        grads.append(g[: c.shape[0]])
    return ao, jnp.stack(grads)


# ------------------------------------------------------------ weighted XC
# Same contractions as scf/hf.py _vxc_* but with a per-point weight vector
# (atomic-grid weights are not uniform).  All dense (ng, nao) matmuls.
@partial(jax.jit, static_argnames=("xc",))
def vxc_lda(aoR, dm, w, xc):
    t = aoR @ dm
    rho = jnp.maximum(jnp.sum(t * aoR, axis=-1), 0.0)
    exc, vrho, _ = xc.exc_vxc(rho)
    e_xc = jnp.sum(w * rho * exc)
    vmat = (aoR * (w * vrho)[:, None]).T @ aoR
    return e_xc, vmat, jnp.sum(w * rho)


@partial(jax.jit, static_argnames=("xc",))
def vxc_gga(aoR, ao_grad, dm, w, xc):
    t = aoR @ dm
    rho = jnp.maximum(jnp.sum(t * aoR, axis=-1), 0.0)
    grad_rho = 2.0 * jnp.einsum("gi,xgi->xg", t, ao_grad)
    sigma = jnp.sum(grad_rho * grad_rho, axis=0)
    exc, vrho, vsigma = xc.exc_vxc(rho, sigma)
    e_xc = jnp.sum(w * rho * exc)
    aow = 0.5 * vrho[:, None] * aoR + 2.0 * jnp.einsum(
        "xg,g,xgi->gi", grad_rho, vsigma, ao_grad)
    half = aoR.T @ (w[:, None] * aow)
    return e_xc, half + half.T, jnp.sum(w * rho)


@partial(jax.jit, static_argnames=("xc",))
def vxc_mgga(aoR, ao_grad, dm, w, xc):
    t = aoR @ dm
    rho = jnp.maximum(jnp.sum(t * aoR, axis=-1), 0.0)
    grad_rho = 2.0 * jnp.einsum("gi,xgi->xg", t, ao_grad)
    sigma = jnp.sum(grad_rho * grad_rho, axis=0)
    tg = jnp.einsum("xgi,ij->xgj", ao_grad, dm)
    tau = 0.5 * jnp.einsum("xgj,xgj->g", tg, ao_grad)
    exc, vrho, vsigma, vtau = xc.exc_vxc_mgga(rho, sigma, tau)
    e_xc = jnp.sum(w * rho * exc)
    aow = 0.5 * vrho[:, None] * aoR + 2.0 * jnp.einsum(
        "xg,g,xgi->gi", grad_rho, vsigma, ao_grad)
    half = aoR.T @ (w[:, None] * aow)
    vtau_term = 0.5 * jnp.einsum("xgi,g,xgj->ij", ao_grad, w * vtau, ao_grad)
    return e_xc, half + half.T + vtau_term, jnp.sum(w * rho)
