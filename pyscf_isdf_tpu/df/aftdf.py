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

Scope: Gamma point. The FFT collocation engines remain the production
J/K route on TPU (the O(nao^2 ngrids) pair tensor is bandwidth-hostile);
AFTDF serves as an independent integral oracle and covers steep-function
edge cases where collocation converges slowly.
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
