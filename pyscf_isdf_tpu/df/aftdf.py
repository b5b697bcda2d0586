"""AFTDF: analytic-Fourier-transform density fitting J/K engine.

Reference counterpart: pyscf/pbc/df/aft.py:566 + aft_jk.py:41,135. Pair
densities are represented by their ANALYTIC Fourier coefficients
(ops/ft_ao.ft_aopair — Gaussian product theorem + Hermite closed forms)
instead of grid collocation, so accuracy is set by the G-cutoff alone:

    J_mn = (1/vol) sum_G conj(A[G,mn]) v(G) rho(G),  rho = sum A D
    K_mn = (1/vol) sum_G v(G) [conj(A_G) D A_G^T]_mn

with A = ft_aopair. exxdiv='ewald' rides the kernel's G=0 coefficient:
A(G=0) is exactly the overlap matrix, so the madelung term reduces to the
standard S D S shift automatically.

Scope: Gamma point (AFTDF) and k-sampled (KAFTDF — the reference's
aft_jk.get_j_kpts/get_k_kpts analog, aft_jk.py:41,135, via the
Bloch-phased pair FTs of ops/ft_ao.ft_aopair(kj=...)). The FFT
collocation engines remain the production J/K route on TPU (the
O(nao^2 ngrids) pair tensor is bandwidth-hostile); AFTDF serves as an
independent integral oracle — at k it is the only engine whose accuracy
is set by the G-cutoff alone, making it the k-point oracle for the grid
engines (fftdf_k, isdf_k, gdf).
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.ft_ao import ft_aopair


class AFTDF:
    """Analytic-FT density fitting (Gamma). Build once per geometry."""

    def __init__(self, cell, mesh=None):
        self.cell = cell
        self.mesh = tuple(mesh or cell.mesh)
        self.Gv = cell.get_Gv(self.mesh)
        self.pair = ft_aopair(cell, self.Gv)       # (ng, nao, nao)

    def get_jk(self, dm, with_j=True, with_k=True, exxdiv=None,
               chunk: int = 2048):
        cell = self.cell
        dm = np.asarray(dm)
        vol = cell.vol
        coulG_j = coulomb.get_coulG(cell, mesh=self.mesh, Gv=self.Gv)
        coulG_k = coulomb.get_coulG(cell, mesh=self.mesh, Gv=self.Gv,
                                    exxdiv=exxdiv)
        vj = np.zeros_like(dm) if with_j else None
        vk = np.zeros_like(dm) if with_k else None
        ng = self.Gv.shape[0]
        for g0 in range(0, ng, chunk):
            A = self.pair[g0:g0 + chunk]           # (b, nao, nao)
            if with_j:
                rho = np.einsum("gij,ij->g", A, dm)
                vj += np.einsum("g,gij->ij",
                                (coulG_j[g0:g0 + chunk] / vol) * rho,
                                A.conj()).real
            if with_k:
                vk += np.einsum("g,gmr,rs,gns->mn",
                                coulG_k[g0:g0 + chunk] / vol,
                                A.conj(), dm, A, optimize=True).real
        return vj, vk

    def get_eri(self, chunk: int = 2048):
        """AO ERIs (ij|kl) as an (nao^2, nao^2) matrix from analytic FTs."""
        nao = self.cell.nao
        vol = self.cell.vol
        coulG = coulomb.get_coulG(self.cell, mesh=self.mesh, Gv=self.Gv)
        out = np.zeros((nao * nao, nao * nao))
        ng = self.Gv.shape[0]
        for g0 in range(0, ng, chunk):
            A = self.pair[g0:g0 + chunk].reshape(-1, nao * nao)
            out += np.einsum("gp,g,gq->pq", A.conj(),
                             coulG[g0:g0 + chunk] / vol, A,
                             optimize=True).real
        return out


class KAFTDF:
    """Analytic-FT J/K at sampled k-points (reference aft.py:566 +
    aft_jk.py:41,135 semantics).

    Per (k1, k2) the Bloch pair FT  A[G,m,n] = int_cell
    conj(phi^{k1}_m) phi^{k2}_n e^{-i(q+G).r} dr  (q = k2-k1) is built
    analytically (ft_aopair kj-phase); then

        rho(G)    = (1/nk) sum_k tr(A^{kk}[G] D^k)          (q = 0)
        J^k_mn    = (1/vol) sum_G v(G) rho(G) conj(A^{kk}[G,n,m])
        K^{k1}_mn = (1/(nk vol)) sum_{k2,G} v_q(G)
                      [A^{k1k2}[G] D^{k2} A^{k1k2}[G]^H]_mn

    with v_q = get_coulG(k=q, exxdiv, kpts) (wrap-around included);
    exxdiv='ewald' rides the q=0, G=0 kernel coefficient exactly like
    the Gamma engine (A^{kk}(G=0) = S_k => madelung S D S shift).
    """

    def __init__(self, cell, kpts, mesh=None):
        self.cell = cell
        self.kpts = np.reshape(np.asarray(kpts, dtype=np.float64), (-1, 3))
        self.mesh = tuple(mesh or cell.mesh)
        self.Gv = cell.get_Gv(self.mesh)
        # pair FTs keyed by (k1, k2); A depends on q AND the kj phase
        self._pair = {}

    def _A(self, k1, k2):
        key = (k1, k2)
        if key not in self._pair:
            q = self.kpts[k2] - self.kpts[k1]
            self._pair[key] = ft_aopair(self.cell, self.Gv, q=q,
                                        kj=self.kpts[k2])
        return self._pair[key]

    def get_jk(self, dm_k, with_j=True, with_k=True, exxdiv=None,
               omega=None):
        cell = self.cell
        nk = len(self.kpts)
        dm_k = np.asarray(dm_k)
        vol = cell.vol
        vj = np.zeros_like(dm_k, dtype=np.complex128) if with_j else None
        vk = np.zeros_like(dm_k, dtype=np.complex128) if with_k else None

        if with_j:
            coulG_j = coulomb.get_coulG(cell, mesh=self.mesh, Gv=self.Gv)
            rho = 0.0
            for k in range(nk):
                rho = rho + np.einsum("gmn,nm->g", self._A(k, k),
                                      dm_k[k]) / nk
            vrho = (coulG_j / vol) * rho
            for k in range(nk):
                vj[k] = np.einsum("g,gnm->mn", vrho, self._A(k, k).conj())

        if with_k:
            for k1 in range(nk):
                for k2 in range(nk):
                    q = self.kpts[k2] - self.kpts[k1]
                    vq = coulomb.get_coulG(cell, k=q, exxdiv=exxdiv,
                                           mesh=self.mesh, Gv=self.Gv,
                                           kpts=self.kpts, omega=omega)
                    A = self._A(k1, k2)                    # (ng, nao, nao)
                    t = np.einsum("gmr,rs->gms", A, dm_k[k2],
                                  optimize=True)
                    vk[k1] += np.einsum("g,gms,gns->mn", vq / vol, t,
                                        A.conj(), optimize=True) / nk
        return vj, vk
