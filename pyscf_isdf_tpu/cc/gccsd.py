"""Spin-orbital (general) CCSD + perturbative triples, einsum-native.

Covers the reference's coupled-cluster family (pyscf/pbc/cc — KCCSD is
spin-orbital CCSD over Bloch orbitals, pyscf/pbc/cc/kccsd.py; Gamma-point
molecular driver pyscf/cc/ccsd.py) by redesign rather than translation:

- The amplitude update is ONE pure jitted einsum program (every
  contraction is an MXU GEMM after XLA fusion), not a blocked
  out-of-core Python loop.
- One kernel serves the Gamma point (real f64) and k-point sampling
  (complex, via the momentum-blocked composite index in kccsd.py):
  the classic spin-orbital tables (Stanton et al., JCP 94, 4334 (1991))
  use real-integral symmetry <ij||ab> = <ab||ij> freely; here every
  integral is kept in the orientation dictated by the Wick contraction
  (amplitude-occupied/projection-virtual indices in bra slots,
  amplitude-virtual/projection-occupied in ket slots), so the only
  real-case-invisible changes are the T1/T2 driving terms f_ai and
  <ab||ij> and the conjugated triples contractions — verified against
  the real supercell in tests/test_kccsd.py.
- DIIS extrapolates the stacked amplitude vector on host between jitted
  updates.

Validation: CCSD == FCI exactly for 2-electron cells, first iteration
== MP2, and complex k-point == real Gamma supercell (tests/test_ccsd.py,
tests/test_kccsd.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.scf.diis import DIIS

ein = jnp.einsum


def spinorb_from_spatial(h1, eri_chem):
    """Expand spatial-orbital h1/(pq|rs) chemist ERIs to spin orbitals.

    Interleaved spin convention: spin-orbital 2p+s is spatial p, spin s,
    so an energy-ordered spatial basis keeps the occupied block leading.

    Returns (h1_so, eri_so) with eri_so = <PQ||RS> antisymmetrized
    physicist integrals.
    """
    nmo = h1.shape[0]
    nso = 2 * nmo
    sp = np.arange(nso) // 2
    sz = np.arange(nso) % 2
    same = sz[:, None] == sz[None, :]
    h1so = h1[np.ix_(sp, sp)] * same
    chem = eri_chem[np.ix_(sp, sp, sp, sp)] \
        * same[:, :, None, None] * same[None, None, :, :]
    phys = chem.transpose(0, 2, 1, 3)        # <PR|QS> = (PQ|RS)
    return h1so, phys - phys.transpose(0, 1, 3, 2)


def _pij(x):
    return x - x.swapaxes(0, 1)


def _pab(x):
    return x - x.swapaxes(2, 3)


_BLOCK_NAMES = ("oooo", "ooov", "oovv", "ovov", "ovvo", "ovoo", "oovo",
                "ovvv", "vovv", "vvvo", "vvoo", "vvvv")


def make_blocks(eri, no):
    """Pre-slice the <pq||rs> tensor into the occupied/virtual blocks the
    update consumes — lets a sharded kernel place each block on a device
    mesh without slicing across a sharded axis."""
    o, v = slice(None, no), slice(no, None)
    ix = {"o": o, "v": v}
    return {name: eri[ix[name[0]], ix[name[1]], ix[name[2]], ix[name[3]]]
            for name in _BLOCK_NAMES}


@partial(jax.jit, static_argnames=("no",))
def _update(t1, t2, f, eri, no):
    """One CCSD amplitude update (Stanton-style intermediates).

    eri is <pq||rs> (antisymmetrized physicist); f the (block-diagonal)
    Fock matrix. Orientation of each integral is complex-Hermitian-safe
    (see module docstring).
    """
    return _update_blocks(t1, t2, f, make_blocks(eri, no), no)


@partial(jax.jit, static_argnames=("no",))
def _update_blocks(t1, t2, f, B, no):
    o, v = slice(None, no), slice(no, None)
    fov = f[o, v]
    e = jnp.real(jnp.diagonal(f))
    eo, ev = e[:no], e[no:]
    D1 = eo[:, None] - ev[None, :]
    D2 = (eo[:, None, None, None] + eo[None, :, None, None]
          - ev[None, None, :, None] - ev[None, None, None, :])

    t11 = ein("ia,jb->ijab", t1, t1)
    tau_t = t2 + 0.5 * (t11 - t11.swapaxes(2, 3))
    tau = t2 + t11 - t11.swapaxes(2, 3)

    Foo = f[o, o] - jnp.diag(jnp.diagonal(f[o, o]))
    Fvv = f[v, v] - jnp.diag(jnp.diagonal(f[v, v]))

    Fae = (Fvv - 0.5 * ein("me,ma->ae", fov, t1)
           + ein("mf,mafe->ae", t1, B["ovvv"])
           - 0.5 * ein("mnaf,mnef->ae", tau_t, B["oovv"]))
    Fmi = (Foo + 0.5 * ein("ie,me->mi", t1, fov)
           + ein("ne,mnie->mi", t1, B["ooov"])
           + 0.5 * ein("inef,mnef->mi", tau_t, B["oovv"]))
    Fme = fov + ein("nf,mnef->me", t1, B["oovv"])

    w1 = ein("je,mnie->mnij", t1, B["ooov"])
    Wmnij = (B["oooo"] + w1 - w1.swapaxes(2, 3)
             + 0.25 * ein("ijef,mnef->mnij", tau, B["oovv"]))
    w2 = ein("mb,amef->abef", t1, B["vovv"])
    Wabef = (B["vvvv"] - w2 + w2.swapaxes(0, 1)
             + 0.25 * ein("mnab,mnef->abef", tau, B["oovv"]))
    Wmbej = (B["ovvo"]
             + ein("jf,mbef->mbej", t1, B["ovvv"])
             - ein("nb,mnej->mbej", t1, B["oovo"])
             - ein("jnfb,mnef->mbej",
                   0.5 * t2 + ein("jf,nb->jnfb", t1, t1), B["oovv"]))

    t1new = (f[v, o].T
             + ein("ie,ae->ia", t1, Fae)
             - ein("ma,mi->ia", t1, Fmi)
             + ein("imae,me->ia", t2, Fme)
             - ein("nf,naif->ia", t1, B["ovov"])
             - 0.5 * ein("imef,maef->ia", t2, B["ovvv"])
             - 0.5 * ein("mnae,nmei->ia", t2, B["oovo"])) / D1

    x_ab = ein("ijae,be->ijab", t2, Fae - 0.5 * ein("mb,me->be", t1, Fme))
    x_ij = ein("imab,mj->ijab", t2, Fmi + 0.5 * ein("je,me->mj", t1, Fme))
    x_ring = (ein("imae,mbej->ijab", t2, Wmbej)
              - ein("ie,ma,mbej->ijab", t1, t1, B["ovvo"]))
    t2new = (B["vvoo"].transpose(2, 3, 0, 1)      # <ab||ij>
             + _pab(x_ab) - _pij(x_ij)
             + 0.5 * ein("mnab,mnij->ijab", tau, Wmnij)
             + 0.5 * ein("ijef,abef->ijab", tau, Wabef)
             + _pij(_pab(x_ring))
             + _pij(ein("ie,abej->ijab", t1, B["vvvo"]))
             - _pab(ein("ma,mbij->ijab", t1, B["ovoo"]))) / D2
    return t1new, t2new


@partial(jax.jit, static_argnames=("no",))
def energy(t1, t2, f, eri, no):
    """CC correlation energy <0|H̄|0> (real part)."""
    o, v = slice(None, no), slice(no, None)
    oovv = eri[o, o, v, v]
    e = (ein("ia,ia->", f[o, v], t1)
         + 0.25 * ein("ijab,ijab->", oovv, t2)
         + 0.5 * ein("ijab,ia,jb->", oovv, t1, t1))
    return jnp.real(e)


def kernel(f, eri, nocc, conv_tol=1e-9, max_cycle=100, diis_space=8,
           verbose=False):
    """Solve the CCSD amplitude equations.

    Args:
        f: (nso, nso) Fock matrix (real or complex Hermitian).
        eri: (nso,)*4 antisymmetrized <pq||rs>.
        nocc: number of occupied spin orbitals (leading block).
    Returns dict with e_corr, t1, t2, converged, niter.
    """
    f = jnp.asarray(f)
    eri = jnp.asarray(eri)
    no = int(nocc)
    nv = f.shape[0] - no
    e = np.real(np.diagonal(np.asarray(f)))
    D1 = e[:no, None] - e[None, no:]
    D2 = (e[:no, None, None, None] + e[None, :no, None, None]
          - e[None, None, no:, None] - e[None, None, None, no:])
    t1 = np.asarray(f)[no:, :no].T / D1
    t2 = np.asarray(eri)[no:, no:, :no, :no].transpose(2, 3, 0, 1) / D2
    t1, t2 = jnp.asarray(t1), jnp.asarray(t2)

    diis = DIIS(space=diis_space)
    e_last = float(energy(t1, t2, f, eri, no))
    conv = False
    it = 0
    for it in range(1, max_cycle + 1):
        t1n, t2n = _update(t1, t2, f, eri, no)
        vec = np.concatenate([np.asarray(t1n).ravel(), np.asarray(t2n).ravel()])
        err = vec - np.concatenate([np.asarray(t1).ravel(),
                                    np.asarray(t2).ravel()])
        vec = diis.update(vec, err)
        t1 = jnp.asarray(vec[:no * nv].reshape(no, nv))
        t2 = jnp.asarray(vec[no * nv:].reshape(no, no, nv, nv))
        e_cc = float(energy(t1, t2, f, eri, no))
        de = abs(e_cc - e_last)
        rnorm = float(np.linalg.norm(err))
        if verbose:
            print(f"CCSD cycle {it:3d}  E_corr = {e_cc:.12f}  "
                  f"dE = {de:.2e}  |r| = {rnorm:.2e}")
        e_last = e_cc
        if de < conv_tol and rnorm < np.sqrt(conv_tol):
            conv = True
            break
    return {"e_corr": e_last, "t1": t1, "t2": t2, "converged": conv,
            "niter": it}


def kernel_sharded(f, eri, nocc, mesh=None, conv_tol=1e-9, max_cycle=100,
                   diis_space=8, verbose=False):
    """SPMD CCSD over a device mesh — the reference's mpicc analog
    (pyscf/pbc/mpicc MPI-parallel KCCSD), done the XLA way: the integral
    blocks and t2 are placed with NamedSharding on the trailing virtual
    axis and GSPMD partitions every einsum of the SAME _update_blocks
    program (collectives inserted by the compiler, not hand-written
    MPI). The dominant vvvv/ovvv blocks and t2 are stored 1/ndev per
    device. Bitwise-level parity with the single-device kernel is
    tested on the 8-virtual-device CPU mesh (tests/test_ccsd_sharded.py).
    """
    import math

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    no = int(nocc)
    nv = f.shape[0] - no
    if mesh is None:
        ndev = math.gcd(nv, len(jax.devices()))
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("v",))
    eri = np.asarray(eri)
    blocks = make_blocks(eri, no)

    def spec(name):
        return P(None, None, None, "v") if name[-1] == "v" else P()

    B = {k: jax.device_put(jnp.asarray(b), NamedSharding(mesh, spec(k)))
         for k, b in blocks.items()}
    f_j = jax.device_put(jnp.asarray(f), NamedSharding(mesh, P()))
    t1_sh = NamedSharding(mesh, P())
    t2_sh = NamedSharding(mesh, P(None, None, None, "v"))

    upd = jax.jit(lambda t1, t2: _update_blocks(t1, t2, f_j, B, no),
                  out_shardings=(t1_sh, t2_sh))

    e = np.real(np.diagonal(np.asarray(f)))
    D1 = e[:no, None] - e[None, no:]
    D2 = (e[:no, None, None, None] + e[None, :no, None, None]
          - e[None, None, no:, None] - e[None, None, None, no:])
    t1 = jax.device_put(jnp.asarray(np.asarray(f)[no:, :no].T / D1), t1_sh)
    t2 = jax.device_put(
        jnp.asarray(eri[no:, no:, :no, :no].transpose(2, 3, 0, 1) / D2),
        t2_sh)

    oovv = jnp.asarray(blocks["oovv"])
    fov = jnp.asarray(np.asarray(f)[:no, no:])

    def e_corr(t1, t2):
        return float(jnp.real(
            ein("ia,ia->", fov, t1)
            + 0.25 * ein("ijab,ijab->", oovv, t2)
            + 0.5 * ein("ijab,ia,jb->", oovv, t1, t1)))

    diis = DIIS(space=diis_space)
    e_last = e_corr(t1, t2)
    conv = False
    it = 0
    for it in range(1, max_cycle + 1):
        t1n, t2n = upd(t1, t2)
        vec = np.concatenate([np.asarray(t1n).ravel(),
                              np.asarray(t2n).ravel()])
        err = vec - np.concatenate([np.asarray(t1).ravel(),
                                    np.asarray(t2).ravel()])
        vec = diis.update(vec, err)
        t1 = jax.device_put(jnp.asarray(vec[:no * nv].reshape(no, nv)),
                            t1_sh)
        t2 = jax.device_put(
            jnp.asarray(vec[no * nv:].reshape(no, no, nv, nv)), t2_sh)
        e_cc = e_corr(t1, t2)
        de = abs(e_cc - e_last)
        rnorm = float(np.linalg.norm(err))
        if verbose:
            print(f"CCSD(sharded) cycle {it:3d}  E_corr = {e_cc:.12f}  "
                  f"dE = {de:.2e}  |r| = {rnorm:.2e}")
        e_last = e_cc
        if de < conv_tol and rnorm < np.sqrt(conv_tol):
            conv = True
            break
    return {"e_corr": e_last, "t1": t1, "t2": t2, "converged": conv,
            "niter": it}


@partial(jax.jit, static_argnames=("no",))
def _t_energy(t1, t2, f, eri, no):
    o, v = slice(None, no), slice(no, None)
    e = jnp.real(jnp.diagonal(f))
    eo, ev = e[:no], e[no:]
    D3 = (eo[:, None, None, None, None, None]
          + eo[None, :, None, None, None, None]
          + eo[None, None, :, None, None, None]
          - ev[None, None, None, :, None, None]
          - ev[None, None, None, None, :, None]
          - ev[None, None, None, None, None, :])

    # connected triples driving term, complex-safe orientations
    # <bc||ei> (projection virtuals bra, amplitude virtual + projection
    # occupied ket) and <ma||jk>
    xc = (ein("jkae,bcei->ijkabc", t2, eri[v, v, v, o])
          - ein("imbc,majk->ijkabc", t2, eri[o, v, o, o]))

    def p_ijk(x):
        return x - x.swapaxes(0, 1) - jnp.swapaxes(x, 0, 2)

    def p_abc(x):
        return x - x.swapaxes(3, 4) - jnp.swapaxes(x, 3, 5)

    xc = p_ijk(p_abc(xc))
    xd = p_ijk(p_abc(ein("ia,bcjk->ijkabc", t1, eri[v, v, o, o])))
    return jnp.real(jnp.sum(jnp.conj(xc) * (xc + xd) / D3)) / 36.0


def ccsd_t(t1, t2, f, eri, nocc):
    """Perturbative triples E(T) (Raghavachari et al. 1989 form, the
    standard spin-orbital expression; vanishes identically for
    2-electron systems — asserted in tests)."""
    return float(_t_energy(jnp.asarray(t1), jnp.asarray(t2),
                           jnp.asarray(f), jnp.asarray(eri), int(nocc)))


def thc_mo_eri(isdf, mo_coeff):
    """Full chemist MO ERI tensor from the ISDF/THC factors:

        (pq|rs) ~= sum_PQ X_pP X_qP W_PQ X_rQ X_sQ,   X = aoRg @ C

    O(nip^2 nmo^2) MXU GEMMs instead of nmo^2 grid FFTs — the
    THC-CCSD integral path (pairs the flagship ISDF engine with the
    coupled-cluster stack; accuracy = the ISDF fit, tested vs exact).
    """
    Xg = np.asarray(isdf.aoRg @ jnp.asarray(mo_coeff, isdf.aoRg.dtype))
    W = np.asarray(isdf.W)
    nmo = Xg.shape[1]
    pair = np.einsum("pi,pj->pij", Xg, Xg).reshape(len(W), nmo * nmo)
    out = pair.T @ (W @ pair)
    return out.reshape(nmo, nmo, nmo, nmo)


def ccsd(system, scf_res, nocc=None, with_t=False, conv_tol=1e-9,
         max_cycle=100, verbose=False, isdf=None):
    """Gamma-point closed-shell CCSD on a converged RHF/RKS reference.

    ERIs from the FFT-grid MO transform (df/fft_ao2mo.general); orbital
    energies as-is (the exxdiv convention matches mp/mp2.py).
    """
    from pyscf_isdf_tpu.df import fft_ao2mo

    mo_e = np.asarray(scf_res["mo_energy"])
    mo_c = np.asarray(scf_res["mo_coeff"])
    if nocc is None:
        nocc = system.nelec // 2
    nmo = mo_c.shape[1]

    if isdf is not None:
        eri_mo = thc_mo_eri(isdf, mo_c)          # THC-CCSD integral path
    else:
        aoR = system.aoR
        moR = aoR @ jnp.asarray(mo_c, aoR.dtype)
        coulG = jnp.asarray(system.coulG)
        eri_mo = np.asarray(fft_ao2mo.general(
            moR, moR, moR, moR, coulG, system.mesh, system.weight)
        ).reshape(nmo, nmo, nmo, nmo)

    f_sp = np.diag(mo_e)
    _, eri_so = spinorb_from_spatial(f_sp, eri_mo)
    e_so = np.repeat(mo_e, 2)
    f_so = np.diag(e_so)

    out = kernel(f_so, eri_so, 2 * nocc, conv_tol=conv_tol,
                 max_cycle=max_cycle, verbose=verbose)
    out["e_hf"] = scf_res["e_tot"]
    out["e_tot"] = scf_res["e_tot"] + out["e_corr"]
    if with_t:
        out["e_t"] = ccsd_t(out["t1"], out["t2"], f_so, eri_so, 2 * nocc)
        out["e_tot"] += out["e_t"]
    return out


def uhf_spinorb_basis(mo_coeff, mo_energy, nelec):
    """Occupied-first spin-orbital basis from a UHF reference.

    Columns are ordered [occ-alpha, occ-beta, vir-alpha, vir-beta] so the
    spin-agnostic kernels (this module's, cc/kccsd_blocked's) see one
    leading occupied block. Returns (C_cat, e_so, sz, nocc_so) where
    C_cat stacks the per-spin SPATIAL coefficients column-wise (each
    spin orbital has its own spatial part — the UHF generalization of
    spinorb_from_spatial's interleaving) and sz labels each column's
    spin (0=alpha, 1=beta).
    """
    ca, cb = (np.asarray(c) for c in mo_coeff)
    ea, eb = (np.asarray(e) for e in mo_energy)
    na, nb = (int(n) for n in nelec)
    nma, nmb = ca.shape[1], cb.shape[1]
    C_cat = np.concatenate(
        [ca[:, :na], cb[:, :nb], ca[:, na:], cb[:, nb:]], axis=1)
    e_so = np.concatenate([ea[:na], eb[:nb], ea[na:], eb[nb:]])
    sz = np.concatenate([np.zeros(na, int), np.ones(nb, int),
                         np.zeros(nma - na, int), np.ones(nmb - nb, int)])
    return C_cat, e_so, sz, na + nb


def antisymmetrize_spin_chem(chem, sz):
    """<PQ||RS> from chemist (PQ|RS) over SPIN-LABELED columns.

    Unlike spinorb_from_spatial (which expands a spatial tensor), the
    input here is already a full ERI over spin-orbital columns with
    per-spin spatial parts (UHF); only the spin delta masks and the
    chemist->physicist reorder + antisymmetrization remain.
    """
    same = sz[:, None] == sz[None, :]
    chem = chem * same[:, :, None, None] * same[None, None, :, :]
    phys = chem.transpose(0, 2, 1, 3)
    return phys - phys.transpose(0, 1, 3, 2)


def uccsd(system, scf_res, with_t=False, conv_tol=1e-9, max_cycle=100,
          verbose=False):
    """Gamma-point spin-unrestricted CCSD (+ optional (T)) on a UHF/UKS
    reference.

    Reference contract: pyscf/cc/uccsd.py (spin-adapted UCCSD kernel).
    Here the UHF spin orbitals feed the ONE spin-orbital engine
    (:func:`kernel`), which is spin-agnostic by construction — the same
    program that serves RHF (via spinorb_from_spatial) and the k-point
    composite/blocked drivers. For a closed-shell reference this reduces
    exactly to :func:`ccsd` (tested); for open shells it is the
    spin-orbital UCCSD energy.
    """
    from pyscf_isdf_tpu.df import fft_ao2mo

    C_cat, e_so, sz, nocc_so = uhf_spinorb_basis(
        scf_res["mo_coeff"], scf_res["mo_energy"],
        scf_res.get("nelec") or _uhf_nelec_fallback(system))
    aoR = system.aoR
    moR = aoR @ jnp.asarray(C_cat, aoR.dtype)
    coulG = jnp.asarray(system.coulG)
    nso = C_cat.shape[1]
    chem = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, coulG, system.mesh, system.weight)
    ).reshape(nso, nso, nso, nso)
    eri_so = antisymmetrize_spin_chem(chem, sz)
    f_so = np.diag(e_so)

    out = kernel(f_so, eri_so, nocc_so, conv_tol=conv_tol,
                 max_cycle=max_cycle, verbose=verbose)
    out["e_hf"] = scf_res["e_tot"]
    out["e_tot"] = scf_res["e_tot"] + out["e_corr"]
    if with_t:
        out["e_t"] = ccsd_t(out["t1"], out["t2"], f_so, eri_so, nocc_so)
        out["e_tot"] += out["e_t"]
    return out


def _uhf_nelec_fallback(system):
    cell = system.cell
    na = (cell.nelectron + cell.spin) // 2
    return na, cell.nelectron - na
