"""Multi-chip k-point ISDF build + k-sampled SCF step (grid-sharded).

Closes VERDICT r2 next #3: round 2's distributed layer (SPMD ISDF build,
sharded SCF step) covered the Gamma supercell only, while the reference's
distributed machinery is k-point-first (pyscf/pbc/mpitools/mpi.py:37-286,
mpicc/kccsd_rhf.py). Here the per-q W build of df/isdf_k.py:155-207 —
the one-time FFT/solve streams — runs over the ICI device mesh:

  * the k-stacked periodic-part matrix U (ng, nk*nao) is row-sharded
    into x-slabs;
  * IP selection is the SPMD greedy pivoted Cholesky of
    parallel/isdf_sharded.py generalized to the complex pair Gram
    Z[g,g'] = |sum_a U[g,a] conj(U[g',a])|^2 (one all_gather per pivot);
  * xi columns are local Cholesky solves against the replicated IP Gram;
  * every W_q goes through the distributed 3-D FFT (all_to_all
    transposes) with the q-kernel in transposed layout, assembled by one
    psum per q.

The per-iteration k-point SCF step (:func:`make_kscf_step`) shards the
grid axis of aoR_k for J/Vxc quadrature (distributed Poisson + psum) and
keeps exchange as replicated n_IP GEMMs through the ISDFK factors —
mirroring scf_step.py at k. Single-device parity is tested on the
8-virtual-device CPU mesh (tests/test_parallel.py) and exercised by the
driver dryrun.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pyscf_isdf_tpu.df.isdf_k import ISDFK, unique_q
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.parallel.mesh import GRID_AXIS
from pyscf_isdf_tpu.parallel import distributed_fft as dfft


def _select_ips_local_c(U_l, n_ip: int):
    """SPMD greedy pivoted Cholesky on the sharded COMPLEX pair Gram.

    Runs inside shard_map; per pivot one all_gather of the winning
    candidate (residual diagonal + complex U row + real L column).
    Returns (Ug replicated (n_ip, nk*nao) complex, locs (n_ip,)).
    """
    ngl, nka = U_l.shape
    me = jax.lax.axis_index(GRID_AXIS)
    rdt = U_l.real.dtype
    d0 = jnp.sum(jnp.abs(U_l) ** 2, axis=1).astype(rdt) ** 2

    def body(i, state):
        d, L, Ug, owners, locs = state
        pl = jnp.argmax(d).astype(jnp.int32)
        row = U_l[pl]
        cand = jnp.concatenate([
            d[pl][None], row.real, row.imag, L[:, pl]])
        allc = jax.lax.all_gather(cand, GRID_AXIS)
        j = jnp.argmax(allc[:, 0]).astype(jnp.int32)
        dmax = allc[j, 0]
        row_u = allc[j, 1:1 + nka] + 1j * allc[j, 1 + nka:1 + 2 * nka]
        Lp = allc[j, 1 + 2 * nka:]
        zrow = jnp.abs(U_l @ row_u.conj()) ** 2
        lrow = (zrow - L.T @ Lp) / jnp.sqrt(jnp.maximum(dmax, 1e-300))
        L = L.at[i].set(lrow)
        d = jnp.maximum(d - lrow * lrow, 0.0)
        d = jnp.where(me == j, d.at[pl].set(0.0), d)
        Ug = Ug.at[i].set(row_u)
        owners = owners.at[i].set(j)
        locs = locs.at[i].set(jnp.where(me == j, pl, -1))
        return d, L, Ug, owners, locs

    state = (
        d0,
        jnp.zeros((n_ip, ngl), rdt),
        jnp.zeros((n_ip, nka), U_l.dtype),
        jnp.zeros((n_ip,), jnp.int32),
        jnp.zeros((n_ip,), jnp.int32),
    )
    _, _, Ug, owners, locs = jax.lax.fori_loop(0, n_ip, body, state)
    return Ug, owners, locs


def build_isdf_k_sharded(dev_mesh, cell, aoR_k, kpts, n_ip=None,
                         c: float = 8.0, fft_chunk: int = 16) -> ISDFK:
    """Multi-chip k-point ISDF build; returns a replicated :class:`ISDFK`.

    Args:
        dev_mesh: jax.sharding.Mesh with axis GRID_AXIS.
        aoR_k: (nk, ngrids, nao) complex Bloch AO values (shardable along
            the grid axis).
    """
    kpts = np.reshape(np.asarray(kpts), (-1, 3))
    nk, ng, nao = aoR_k.shape
    if n_ip is None:
        n_ip = int(c * nao * nk)
    n_ip = min(n_ip, ng)
    mesh3 = tuple(cell.mesh)
    weight = cell.grid_weight

    rdtype = jnp.float64 if aoR_k.dtype == jnp.complex128 else jnp.float32
    coords = jnp.asarray(cell.uniform_grid(), rdtype)
    phases = jnp.exp(-1j * coords @ jnp.asarray(kpts.T, coords.dtype))
    U3 = aoR_k * phases.T[:, :, None].astype(aoR_k.dtype)
    U = jnp.transpose(U3, (1, 0, 2)).reshape(ng, nk * nao)

    q_list, qmap = unique_q(cell, kpts)
    coulG_q = np.stack([
        coulomb.get_coulG(cell, k=q, exxdiv=None, kpts=kpts)
        for q in q_list
    ])
    # per-q kernels in the mid-transform (transposed) layout, sharded
    coulG_q_t = jnp.stack([
        dfft.coulG_transposed_layout(jnp.asarray(cq, rdtype), mesh3)
        for cq in coulG_q
    ])

    @partial(
        shard_map,
        mesh=dev_mesh,
        in_specs=(P(GRID_AXIS, None), P(None, GRID_AXIS)),
        out_specs=(P(None, None), P(None, None, None), P(None)),
        check_vma=False,
    )
    def _build(U_l, coulG_q_t_l):
        Ug, owners, locs = _select_ips_local_c(U_l, n_ip)
        # xi columns: local solve against the replicated IP Gram
        R1 = Ug @ Ug.conj().T
        C1 = (R1 * R1.conj()).real
        is_f64 = jnp.finfo(C1.dtype).bits >= 64
        eps = jnp.asarray(1e-12 if is_f64 else 3e-7, C1.dtype) \
            * (jnp.trace(C1) / n_ip if is_f64 else jnp.trace(C1))
        cho = jax.scipy.linalg.cho_factor(
            C1 + eps * jnp.eye(n_ip, dtype=C1.dtype))
        R2 = U_l @ Ug.conj().T                       # (ngl, nip)
        C2_l = (R2 * R2.conj()).real
        xi_l = jax.scipy.linalg.cho_solve(cho, C2_l.T)   # (nip, ngl)
        xi_c = xi_l.astype(U_l.dtype)

        npad = (-n_ip) % fft_chunk
        xi_p = jnp.pad(xi_c, ((0, npad), (0, 0)))
        blocks = xi_p.reshape(-1, fft_chunk, xi_c.shape[1])

        def wq_for(cq_t_l):
            def w_cols(block):
                v = dfft.poisson_slab_c(block, cq_t_l, mesh3)
                return xi_c @ v.T                    # (nip, fc) local part

            Wcols = jax.lax.map(w_cols, blocks)
            W = weight * jnp.moveaxis(Wcols, 0, 1).reshape(n_ip, -1)[:, :n_ip]
            W = jax.lax.psum(W, GRID_AXIS)
            return 0.5 * (W + W.conj().T)

        Wq = jax.lax.map(wq_for, coulG_q_t_l)        # (nq, nip, nip)

        ngl = U_l.shape[0]
        glob = jax.lax.psum(jnp.where(locs >= 0, owners * ngl + locs, 0),
                            GRID_AXIS)
        return Ug, Wq, glob.astype(jnp.int32)

    Ug_flat, Wq, ip_idx = jax.jit(_build)(U, coulG_q_t)
    Ug = Ug_flat.reshape(n_ip, nk, nao).transpose(1, 0, 2)   # (nk, nip, nao)
    return ISDFK(Ug=Ug, Wq=Wq, qmap=qmap, ip_idx=ip_idx, xi=None)


def make_kscf_step(dev_mesh, mesh3, weight, nk, nocc_tot,
                   xc: str | None = None, exxdiv_madelung: float = 0.0):
    """Jitted grid-sharded k-point SCF iteration (KRHF / KRKS-LDA).

    Returns ``step(dm_k, aoR_k, coulG_t, isdfk, hcore_k, X_k, S_k)
    -> (dm_new_k, e_elec)`` with aoR_k sharded P(None, GRID_AXIS, None);
    exchange through replicated per-q ISDF GEMMs; occupations are the
    in-graph global Fermi fill across k (scf/jit_diis.py make_dm
    semantics; full-rank X required)."""
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb

    @partial(
        shard_map,
        mesh=dev_mesh,
        in_specs=(P(None, GRID_AXIS, None), P(GRID_AXIS),
                  P(None, None, None)),
        out_specs=(P(None, None, None), P(None, None, None), P(None)),
        check_vma=False,
    )
    def _grid_part(aoR_k_l, coulG_t_l, dm_k):
        t = jnp.einsum("kgi,kij->kgj", aoR_k_l, dm_k)
        rho_l = jnp.einsum("kgj,kgj->g", t, aoR_k_l.conj()).real / nk
        vR_l = dfft.poisson_slab(rho_l, coulG_t_l, mesh3)
        vj = jax.lax.psum(
            weight * jnp.einsum("kgi,g,kgj->kij", aoR_k_l.conj(),
                                vR_l.astype(rho_l.dtype), aoR_k_l),
            GRID_AXIS)
        if xcspec is not None:
            rho_s = jnp.maximum(rho_l, 1e-30)
            exc, vrho, _ = xcspec.exc_vxc(rho_s)
            e_xc = jax.lax.psum(weight * jnp.sum(rho_s * exc), GRID_AXIS)
            vxc = jax.lax.psum(
                weight * jnp.einsum("kgi,g,kgj->kij", aoR_k_l.conj(),
                                    vrho.astype(rho_l.dtype), aoR_k_l),
                GRID_AXIS)
        else:
            e_xc = jnp.zeros((), rho_l.dtype)
            vxc = jnp.zeros_like(vj)
        return vj, vxc, e_xc[None]

    eigh_k = jax.vmap(jnp.linalg.eigh)

    @jax.jit
    def step(dm_k, aoR_k, coulG_t, isdfk, hcore_k, X_k, S_k):
        cdtype = aoR_k.dtype
        rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
        vj, vxc, e_xc = _grid_part(aoR_k, coulG_t, dm_k)
        e_xc = e_xc[0]
        veff = vj + vxc
        e_k = jnp.zeros((), rdtype)
        if hyb > 0:
            Ug, Wq = isdfk.Ug, isdfk.Wq
            qmap = isdfk.qmap
            M_all = [Ug[k2] @ dm_k[k2] @ Ug[k2].conj().T
                     for k2 in range(nk)]
            vk = []
            for k1 in range(nk):
                acc = jnp.zeros((Ug.shape[2], Ug.shape[2]), cdtype)
                for k2 in range(nk):
                    W = Wq[qmap[k2, k1]]
                    acc = acc + Ug[k1].conj().T @ (M_all[k2] * W.conj()) \
                        @ Ug[k1]
                vk.append(acc / nk)
            vk = jnp.stack(vk)
            vk = vk + exxdiv_madelung * jnp.einsum(
                "kij,kjl,klm->kim", S_k, dm_k, S_k)
            veff = veff - 0.5 * hyb * vk
            e_k = -0.25 * hyb * jnp.einsum("kij,kji->", dm_k, vk).real / nk
        F = hcore_k + veff
        Fp = jnp.einsum("kji,kjl,klm->kim", X_k.conj(), F, X_k)
        e, u = eigh_k(Fp)
        C = jnp.einsum("kij,kjm->kim", X_k, u)
        # exact-count fill (occupations.exact_count_occ semantics): a
        # <=fermi threshold overfills on a degenerate Fermi level and
        # the SCF silently converges a wrong-charge state
        flat = e.ravel()
        order = jnp.argsort(flat)
        occ = jnp.zeros_like(flat).at[order[:nocc_tot]].set(
            2.0).reshape(e.shape)
        dm_new = jnp.einsum("kim,km,kjm->kij", C, occ.astype(cdtype),
                            C.conj())
        e_elec = (jnp.einsum("kij,kji->", dm_k, hcore_k).real / nk
                  + 0.5 * jnp.einsum("kij,kji->", dm_k, vj).real / nk
                  + e_xc + e_k)
        return dm_new, e_elec

    return step
