"""Closed-shell (spatial-orbital) k-point CCSD — the production memory tier.

The blocked spin-orbital kernel (cc/kccsd_blocked.py) already reduces
KCCSD from O((nk nso)^4) to O(nk^3) block storage, but spin-orbital
blocks carry a 16x redundancy for RHF references: diamond 2x2x2
gth-dzvp needs ~31 GB for the vvvv class alone. The reference's
production KCCSD is spatial-orbital (pyscf/pbc/cc/kccsd_rhf.py:51-107).

Design: NO hand-transcribed closed-shell equations. For an RHF
reference every tensor of the spin-orbital CCSD program is determined
by at most three spatial components (spin-flip symmetry + Sz
conservation leave exactly the canonical patterns):

    4-index: c00 = T(up,up,up,up), cab = T(up,dn,up,dn),
             cba = T(up,dn,dn,up)           (mirrors by spin flip)
    2-index: one spin-diagonal component.

The spin summation of every contraction is ENUMERATED mechanically
(:func:`skein`): assign up/dn to each einsum label, keep assignments
satisfying Sz conservation per tensor, group equal contributions, and
run each surviving term through the momentum-blocked einsum engine
(kccsd_blocked.kein). The amplitude program text is the UNCHANGED
Stanton spin-orbital program of cc/gccsd.py — zero new-equation
transcription risk; closed-shell parity with the spin-orbital blocked
kernel is exact by construction and pinned to 1e-10 in
tests/test_kccsd_blocked.py.

Memory at diamond 2x2x2 gth-dzvp (nmo=26, nocc=4, nvir=22): the two
stored spatial ERI tensors per class (direct <pq|rs> and exchange
<pq|sr>) total ~6.4 GB, t2 components ~0.2 GB — comfortably inside the
16 GB bar that spin-orbital storage misses.
"""
from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.cc.kccsd_blocked import KAlgebra, kein, _perm_last2
from pyscf_isdf_tpu.scf.diis import DIIS

_P00 = (0, 0, 0, 0)
_PAB = (0, 1, 0, 1)
_PBA = (0, 1, 1, 0)
_P4 = (_P00, _PAB, _PBA)


def _flip(p):
    return tuple(1 - s for s in p)


def _canon(p):
    """Canonical key (first spin 0); RHF spin-flip symmetry is sign-free."""
    return _flip(p) if p[0] == 1 else p


class SK:
    """RHF spin-component tensor: dict {canonical pattern: blocked array}.

    4-index entries use kccsd_blocked's momentum-blocked layout
    (nk,nk,nk,d1..d4, fourth momentum implied); 2-index (nk,d1,d2).
    Missing patterns are zero.
    """

    def __init__(self, comps):
        self.c = dict(comps)

    @property
    def is2(self):
        return all(len(k) == 2 for k in self.c)

    def get(self, pattern):
        return self.c.get(_canon(pattern))

    def _binop(self, other, op):
        if isinstance(other, SK):
            keys = set(self.c) | set(other.c)
            out = {}
            for k in keys:
                a, b = self.c.get(k), other.c.get(k)
                if a is None:
                    a = jnp.zeros_like(b)
                if b is None:
                    b = jnp.zeros_like(a)
                out[k] = op(a, b)
            return SK(out)
        return SK({k: op(v, other) for k, v in self.c.items()})

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __mul__(self, s):
        return SK({k: v * s for k, v in self.c.items()})

    __rmul__ = __mul__

    def __truediv__(self, d):
        return SK({k: v / d for k, v in self.c.items()})


def _perm_pattern(p, perm):
    return tuple(p[i] for i in perm)


def sk_perm_ab(skt, ka):
    """Swap the two trailing labels (3rd/4th): blocked _perm_last2 plus
    pattern reshuffle."""
    out = {}
    for p, arr in skt.c.items():
        q = _canon(_perm_pattern(p, (0, 1, 3, 2)))
        out[q] = out.get(q, 0) + _perm_last2(arr, ka)
    return SK(out)


def sk_perm_ij(skt):
    """Swap the two leading labels (1st/2nd): block axes (0,1) and
    orbital axes (3,4) plus pattern reshuffle."""
    out = {}
    for p, arr in skt.c.items():
        q = _canon(_perm_pattern(p, (1, 0, 2, 3)))
        out[q] = out.get(q, 0) + arr.swapaxes(0, 1).swapaxes(3, 4)
    return SK(out)


def _valid4(s):
    return s[0] + s[1] == s[2] + s[3]


def skein(spec, A: SK, B: SK, ka: KAlgebra):
    """Spin-enumerated, momentum-blocked einsum between SK tensors.

    Enumerates up/dn assignments of the einsum labels, keeps those
    satisfying Sz conservation on every tensor, groups assignments that
    touch identical stored components (spin-flip mirrors), and executes
    each group once via the momentum engine with an integer weight.
    """
    ins, out = spec.split("->")
    tA, tB = ins.split(",")
    labels = sorted(set(tA + tB + out))
    a2, b2 = A.is2, B.is2
    o2 = len(out) == 2
    o0 = len(out) == 0

    groups = {}
    for assign in itertools.product((0, 1), repeat=len(labels)):
        s = dict(zip(labels, assign))
        sa = tuple(s[l] for l in tA)
        sb = tuple(s[l] for l in tB)
        so = tuple(s[l] for l in out)
        if (len(sa) == 4 and not _valid4(sa)) or \
           (len(sa) == 2 and sa[0] != sa[1]):
            continue
        if (len(sb) == 4 and not _valid4(sb)) or \
           (len(sb) == 2 and sb[0] != sb[1]):
            continue
        if not o0:
            if (len(so) == 4 and not _valid4(so)) or \
               (len(so) == 2 and so[0] != so[1]):
                continue
            if so[0] == 1:
                continue          # mirror pattern: implied by symmetry
        ca, cb = _canon(sa), _canon(sb)
        if ca not in A.c or cb not in B.c:
            continue              # zero component
        key = (ca, cb, so if not o0 else ())
        groups[key] = groups.get(key, 0) + 1

    out_c = {}
    scalar = 0.0
    for (ca, cb, so), w in groups.items():
        val = kein(spec, A.c[ca], B.c[cb], ka)
        if o0:
            scalar = scalar + w * val
        else:
            out_c[so] = out_c.get(so, 0) + w * val
    if o0:
        return scalar
    return SK(out_c)


# ------------------------------------------------------------ the program
def make_rupdate(ka: KAlgebra):
    """Closed-shell blocked CCSD update — the gccsd._update_blocks text
    with SK tensors (spin summation mechanical, momenta blocked)."""

    def pij(x):
        return x - sk_perm_ij(x)

    def pab(x):
        return x - sk_perm_ab(x, ka)

    def update(t1, t2, fov, B, D1, D2, abij):
        sein = lambda s, a, b: skein(s, a, b, ka)

        t11 = sein("ia,jb->ijab", t1, t1)
        tau_t = t2 + 0.5 * (t11 - sk_perm_ab(t11, ka))
        tau = t2 + t11 - sk_perm_ab(t11, ka)

        Fae = (sein("mf,mafe->ae", t1, B["ovvv"])
               - 0.5 * sein("mnaf,mnef->ae", tau_t, B["oovv"]))
        Fmi = (sein("ne,mnie->mi", t1, B["ooov"])
               + 0.5 * sein("inef,mnef->mi", tau_t, B["oovv"]))
        Fme = fov + sein("nf,mnef->me", t1, B["oovv"])

        w1 = sein("je,mnie->mnij", t1, B["ooov"])
        Wmnij = (B["oooo"] + w1 - sk_perm_ab(w1, ka)
                 + 0.25 * sein("ijef,mnef->mnij", tau, B["oovv"]))
        w2 = sein("mb,amef->abef", t1, B["vovv"])
        Wabef = (B["vvvv"] - w2 + sk_perm_ij(w2)
                 + 0.25 * sein("mnab,mnef->abef", tau, B["oovv"]))
        t1t1 = sein("jf,nb->jnfb", t1, t1)
        Wmbej = (B["ovvo"]
                 + sein("jf,mbef->mbej", t1, B["ovvv"])
                 - sein("nb,mnej->mbej", t1, B["oovo"])
                 - sein("jnfb,mnef->mbej", 0.5 * t2 + t1t1, B["oovv"]))

        t1new = (sein("ie,ae->ia", t1, Fae)
                 - sein("ma,mi->ia", t1, Fmi)
                 + sein("imae,me->ia", t2, Fme)
                 - sein("nf,naif->ia", t1, B["ovov"])
                 - 0.5 * sein("imef,maef->ia", t2, B["ovvv"])
                 - 0.5 * sein("mnae,nmei->ia", t2, B["oovo"])) / D1

        x_ab = sein("ijae,be->ijab", t2,
                    Fae - 0.5 * sein("mb,me->be", t1, Fme))
        x_ij = sein("imab,mj->ijab", t2,
                    Fmi + 0.5 * sein("je,me->mj", t1, Fme))
        ring_t1 = sein("ma,mbej->abej", t1, B["ovvo"])
        x_ring = (sein("imae,mbej->ijab", t2, Wmbej)
                  - sein("ie,abej->ijab", t1, ring_t1))
        t2new = (abij
                 + pab(x_ab) - pij(x_ij)
                 + 0.5 * sein("mnab,mnij->ijab", tau, Wmnij)
                 + 0.5 * sein("ijef,abef->ijab", tau, Wabef)
                 + pij(pab(x_ring))
                 + pij(sein("ie,abej->ijab", t1, B["vvvo"]))
                 - pab(sein("ma,mbij->ijab", t1, B["ovoo"]))) / D2
        return t1new, t2new

    return update


def sk_energy(t1, t2, B_oovv, ka):
    """<0|Hbar|0> (canonical f): 0.25 sum <ij||ab>(t2 + 2 t1 t1)."""
    t11 = skein("ia,jb->ijab", t1, t1, ka)
    e = skein("ijab,ijab->", B_oovv, t2 + 2.0 * t11, ka)
    return float(np.real(e)) * 0.25


# ------------------------------------------------------- integral builder
_CLASSES = ("oooo", "ooov", "oovv", "ovov", "ovvo", "ovoo", "oovo",
            "ovvv", "vovv", "vvvo", "vvoo", "vvvv")


def _t2_from_mixed(T, ka):
    """Reassemble the SK amplitude from its mixed (up,dn,up,dn)
    component: c00 = T - perm_ab(T); cba = -perm_ab(T)."""
    Tp = _perm_last2(T, ka)
    return SK({_P00: T - Tp, _PAB: T, _PBA: -Tp})


def build_spatial_eris(system, scf_res):
    """Momentum-blocked SPATIAL <pq||rs> spin components per o/v class.

    Per block (k1,k2,k3): direct V = <pq|rs> and exchange Vx = <pq|sr>
    from fft_ao2mo.ao2mo_7d (1/nk supercell normalization); components
    c00 = V - Vx, cab = V, cba = -Vx.
    """
    mo_e = np.asarray(scf_res["mo_energy"])
    mo_c = [np.asarray(c) for c in scf_res["mo_coeff"]]
    mo_occ = np.asarray(scf_res["mo_occ"])
    kpts = system.kpts
    nk = len(kpts)
    ka = KAlgebra(system.cell.a, kpts)

    noccs = (mo_occ > 0.5).sum(axis=1)
    if not np.all(noccs == noccs[0]):
        raise NotImplementedError(
            "closed-shell blocked KCCSD needs uniform per-k occupation")
    mo_cs, mo_es = [], []
    for k in range(nk):
        perm = np.argsort(mo_occ[k] < 0.5, kind="stable")
        mo_cs.append(mo_c[k][:, perm])
        mo_es.append(mo_e[k][perm])
    no = int(noccs[0])
    nmo = mo_c[0].shape[1]
    nv = nmo - no

    from pyscf_isdf_tpu.df import fft_ao2mo

    eri7 = fft_ao2mo.ao2mo_7d(system, mo_cs)
    osl, vsl = slice(0, no), slice(no, nmo)
    ix = {"o": osl, "v": vsl}

    from pyscf_isdf_tpu.cc.kccsd_blocked import symmetrized_phys_tensor

    Vs = symmetrized_phys_tensor(eri7, ka, nk, nmo)

    def cls_shape(name):
        return tuple(no if c == "o" else nv for c in name)

    V = {name: np.zeros((nk, nk, nk) + cls_shape(name), dtype=complex)
         for name in _CLASSES}
    Vx = {name: np.zeros_like(V[name]) for name in _CLASSES}

    for k1 in range(nk):
        for k2 in range(nk):
            for k3 in range(nk):
                k4 = int(ka.k4(k1, k2, k3))
                phys = Vs[k1, k2, k3]
                physx = Vs[k1, k2, k4].transpose(0, 1, 3, 2)  # <pq|sr>
                for name in _CLASSES:
                    sl = (ix[name[0]], ix[name[1]], ix[name[2]],
                          ix[name[3]])
                    V[name][k1, k2, k3] = phys[sl]
                    Vx[name][k1, k2, k3] = physx[sl]

    B = {}
    for name in _CLASSES:
        Vj = jnp.asarray(V[name])
        Vxj = jnp.asarray(Vx[name])
        B[name] = SK({_P00: Vj - Vxj, _PAB: Vj, _PBA: -Vxj})

    e_k = np.stack(mo_es)
    return ka, B, e_k[:, :no], e_k[:, no:], no, nv


def krccsd(system, scf_res, conv_tol=1e-9, max_cycle=100, diis_space=8,
           verbose=False):
    """Closed-shell blocked KCCSD; e_corr per unit cell.

    Iterates on the mixed-spin spatial amplitude T[ki,kj,ka](i,j,a,b)
    (all other spin components are its antisymmetrizations); memory and
    flops are the spatial-orbital tier of the reference's kccsd_rhf.
    """
    nk = len(system.kpts)
    ka, B, eo, ev, no, nv = build_spatial_eris(system, scf_res)

    D1 = jnp.asarray(eo[:, :, None] - ev[:, None, :])
    g1, g2, g3 = np.meshgrid(np.arange(nk), np.arange(nk),
                             np.arange(nk), indexing="ij")
    k4 = ka.k4(g1, g2, g3)
    D2 = jnp.asarray(eo[g1][:, :, :, :, None, None, None]
                     + eo[g2][:, :, :, None, :, None, None]
                     - ev[g3][:, :, :, None, None, :, None]
                     - ev[k4][:, :, :, None, None, None, :])

    fov = SK({(0, 0): jnp.zeros((nk, no, nv),
                                dtype=B["oovv"].c[_PAB].dtype)})

    from pyscf_isdf_tpu.cc.kccsd_blocked import _transpose_t2_to_vvoo

    abij = SK({p: _transpose_t2_to_vvoo(arr, ka)
               for p, arr in B["vvoo"].c.items()})
    T = abij.c[_PAB] / D2                      # MP2 start (mixed spin)
    t2 = _t2_from_mixed(T, ka)
    t1a = jnp.zeros((nk, no, nv), dtype=T.dtype)
    t1 = SK({(0, 0): t1a})

    update = make_rupdate(ka)
    diis = DIIS(space=diis_space)
    e_last = sk_energy(t1, t2, B["oovv"], ka)
    conv = False
    it = 0
    n1 = t1a.size
    for it in range(1, max_cycle + 1):
        t1n, t2n = update(t1, t2, fov, B, D1, D2, abij)
        Tn = t2n.c[_PAB]
        vec = np.concatenate([np.asarray(t1n.c[(0, 0)]).ravel(),
                              np.asarray(Tn).ravel()])
        err = vec - np.concatenate([np.asarray(t1.c[(0, 0)]).ravel(),
                                    np.asarray(T).ravel()])
        vec = diis.update(vec, err)
        t1a = jnp.asarray(vec[:n1].reshape(nk, no, nv))
        T = jnp.asarray(vec[n1:].reshape((nk, nk, nk, no, no, nv, nv)))
        t1 = SK({(0, 0): t1a})
        t2 = _t2_from_mixed(T, ka)
        e_cc = sk_energy(t1, t2, B["oovv"], ka)
        de = abs(e_cc - e_last)
        rnorm = float(np.linalg.norm(err))
        if verbose:
            print(f"kRCCSD cycle {it:3d}  E_sc = {e_cc:.12f}  "
                  f"dE = {de:.2e}  |r| = {rnorm:.2e}")
        e_last = e_cc
        if de < conv_tol * nk and rnorm < np.sqrt(conv_tol * nk):
            conv = True
            break
    return {"e_corr": e_last / nk, "t1": t1a, "t2": T, "converged": conv,
            "niter": it, "e_hf": scf_res["e_tot"],
            "e_tot": scf_res["e_tot"] + e_last / nk}
