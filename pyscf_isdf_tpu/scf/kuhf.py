"""k-point sampled spin-polarized SCF (KUHF / KUKS).

Combines the Bloch-orbital machinery of :mod:`pyscf_isdf_tpu.scf.khf` with
the spin handling of :mod:`pyscf_isdf_tpu.scf.uhf` (reference semantics:
pyscf/pbc/scf/kuhf.py, pyscf/pbc/dft/kuks.py): per-spin density matrices at
every k, shared Coulomb from the total density, per-spin exchange, global
per-spin Fermi filling across k-points.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf_k
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf import occupations as occupations_mod
from pyscf_isdf_tpu.scf.diis import DIIS
from pyscf_isdf_tpu.scf.khf import KSCFSystem, build_kscf_system  # noqa: F401


def _occ_spin(mo_e_k, nocc_tot):
    # Exactly nocc_tot spin orbitals (argsort; <=fermi overfills ties).
    return occupations_mod.exact_count_occ(mo_e_k, nocc_tot, scale=1.0)


def vxc_spin_kpts(aoR_k, ao_grad_k, dm_a, dm_b, weight, xcspec):
    """Spin-resolved k-point XC energy and potential matrices.

    The spin-polarized counterpart of :func:`scf.khf.vxc_kpts`
    (reference semantics: pyscf/pbc/dft/numint.py nr_uks): densities are
    BZ averages sum_k tr(dm_s[k] ao ao*)/nk, the GGA potential matrix is
    the symmetrized 0.5*vrho*ao + (2 vs_ss grad_s + vs_ab grad_t).grad_ao
    form.  Returns ``(e_xc, vxc_a, vxc_b)`` with vxc_s (nk, nao, nao)
    numpy arrays; shared by the KUKS SCF loop and the kugw v_mf build.
    ``weight`` is the uniform-mesh scalar or a per-point (ng,) vector
    (Becke atomic grids, ops/becke.py).
    """
    nk = aoR_k.shape[0]
    dmaj = jnp.asarray(dm_a, aoR_k.dtype)
    dmbj = jnp.asarray(dm_b, aoR_k.dtype)
    ta = jnp.einsum("kgi,kij->kgj", aoR_k, dmaj)
    tb = jnp.einsum("kgi,kij->kgj", aoR_k, dmbj)
    rho_a = jnp.maximum(jnp.einsum(
        "kgj,kgj->g", ta, aoR_k.conj()).real / nk, 0.0)
    rho_b = jnp.maximum(jnp.einsum(
        "kgj,kgj->g", tb, aoR_k.conj()).real / nk, 0.0)
    w_g = jnp.broadcast_to(jnp.asarray(weight, rho_a.dtype), rho_a.shape)
    if xcspec.family == "gga":
        if ao_grad_k is None:
            raise ValueError("vxc_spin_kpts: GGA needs ao_grad_k")
        ga = 2.0 / nk * jnp.einsum("kgj,kxgj->xg", ta.conj(),
                                   ao_grad_k).real
        gb = 2.0 / nk * jnp.einsum("kgj,kxgj->xg", tb.conj(),
                                   ao_grad_k).real
        s_aa = jnp.sum(ga * ga, axis=0)
        s_ab = jnp.sum(ga * gb, axis=0)
        s_bb = jnp.sum(gb * gb, axis=0)
        exc, (va, vb), (vsaa, vsab, vsbb) = xcspec.exc_vxc_spin(
            rho_a, rho_b, s_aa, s_ab, s_bb)
        e_xc = float(jnp.sum(w_g * (rho_a + rho_b) * exc))

        def vmat_k(vrho, vs_ss, g_s, g_t):
            aow = 0.5 * vrho[:, None] * aoR_k + jnp.einsum(
                "xg,kxgi->kgi",
                2.0 * vs_ss[None, :] * g_s + vsab[None, :] * g_t,
                ao_grad_k)
            half = jnp.einsum("kgi,kgj->kij", aoR_k.conj(),
                              w_g[:, None] * aow)
            return np.asarray(half + half.conj().transpose(0, 2, 1))

        return e_xc, vmat_k(va, vsaa, ga, gb), vmat_k(vb, vsbb, gb, ga)
    exc, (va, vb), _ = xcspec.exc_vxc_spin(rho_a, rho_b)
    e_xc = float(jnp.sum(w_g * (rho_a + rho_b) * exc))
    vxc_a = np.asarray(jnp.einsum(
        "kgi,g,kgj->kij", aoR_k.conj(), w_g * va, aoR_k))
    vxc_b = np.asarray(jnp.einsum(
        "kgi,g,kgj->kij", aoR_k.conj(), w_g * vb, aoR_k))
    return e_xc, vxc_a, vxc_b


def kuhf_kernel(
    system: KSCFSystem,
    xc: Optional[str] = None,
    exxdiv: str = "ewald",
    nelec: Optional[tuple] = None,
    max_cycle: int = 100,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    isdf_precision: Optional[str] = None,
    verbose: bool = False,
    xc_grids: str = "uniform",
):
    """Run k-point spin-polarized SCF. xc=None -> KUHF, else KUKS (LDA).

    ``df='isdf'`` swaps the per-spin exchange onto the k-point ISDF GEMM
    path (one shared factorization, linear in the density matrix).
    """
    if isdf_precision is not None:
        if isdf_precision != "dd":
            raise ValueError(f"unknown isdf_precision {isdf_precision!r}")
        if df != "isdf":
            raise ValueError(
                "isdf_precision='dd' needs the ISDF engine (df='isdf'); "
                f"got df={df!r}")
    cell = system.cell
    nk = len(system.kpts)
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    is_gga = xcspec is not None and xcspec.family == "gga"
    mad_add = hyb * system.madelung
    if rsh:
        from pyscf_isdf_tpu.ops import coulomb as _coulomb

        mad_add = hyb * system.madelung \
            + (alpha - hyb) * _coulomb.madelung_omega(cell, system.kpts,
                                                      omega)

    if nelec is None:
        na = (cell.nelectron + cell.spin) // 2
        nb = cell.nelectron - na
    else:
        na, nb = nelec

    aoR_k = system.aoR_k
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)
    coulG_pairs = jnp.asarray(system.coulG_pairs)
    expmikr = jnp.asarray(system.expmikr, dtype=aoR_k.dtype)
    kweight = weight / nk

    if df not in ("fftdf", "isdf"):
        raise ValueError(f"unknown df engine {df!r}: use 'fftdf' or 'isdf'")
    get_k_spin = None
    coulG_pairs_lr = None
    if rsh and need_k and df != "isdf":
        cpl, _ = fftdf_k.make_k_kernels(cell, system.kpts, omega=omega)
        coulG_pairs_lr = jnp.asarray(cpl)
    if df == "isdf" and need_k:
        from pyscf_isdf_tpu.df import isdf_k as isdf_k_mod

        isdfk = isdf_k_mod.build_isdf_k(
            cell, aoR_k, system.kpts, c=isdf_c,
            exxdiv=(exxdiv if exxdiv not in (None, "ewald") else None),
            precision=isdf_precision)
        if rsh:
            isdfk_lr = isdf_k_mod.build_isdf_k(
                cell, aoR_k, system.kpts, c=isdf_c, omega=omega,
                precision=isdf_precision)

            def get_k_spin(dm_s):
                dmj = jnp.asarray(dm_s, aoR_k.dtype)
                return hyb * isdf_k_mod.get_k_kpts(isdfk, dmj) \
                    + (alpha - hyb) * isdf_k_mod.get_k_kpts(isdfk_lr, dmj)
        else:
            def get_k_spin(dm_s):
                return hyb * isdf_k_mod.get_k_kpts(
                    isdfk, jnp.asarray(dm_s, aoR_k.dtype))

    ao_grad_k = None
    if is_gga:
        from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft_k

        coords = jnp.asarray(cell.uniform_grid())
        Gv = jnp.asarray(cell.get_Gv())
        ao_grad_k = jnp.stack([
            ao_gradient_fft_k(aoR_k[k], mesh, Gv,
                              jnp.asarray(system.kpts[k]), coords)
            for k in range(nk)
        ])

    # XC-quadrature seam (opt-in Becke atomic grids; the spin-k analog
    # of the scf/khf.py branch — vxc_spin_kpts takes scalar or vector
    # weights, so only the arrays swap)
    xc_aoR_k, xc_grad_k, xc_w = aoR_k, ao_grad_k, weight
    if xcspec is not None and xc_grids.startswith("becke"):
        from pyscf_isdf_tpu.ops import becke as becke_mod

        if ":" in xc_grids:
            n_rad, n_theta = map(int, xc_grids.split(":", 1)[1].split(","))
            bg = becke_mod.build_becke_grids(cell, n_rad=n_rad,
                                             n_theta=n_theta)
        else:
            bg = becke_mod.build_becke_grids(cell)
        pairs = [becke_mod.eval_ao_and_grad(cell, bg.coords,
                                            kpt=system.kpts[k],
                                            need_grad=is_gga)
                 for k in range(nk)]
        xc_aoR_k = jnp.stack([p[0] for p in pairs]).astype(aoR_k.dtype)
        xc_grad_k = (jnp.stack([p[1] for p in pairs]).astype(aoR_k.dtype)
                     if is_gga else None)
        xc_w = jnp.asarray(bg.weights, dtype=jnp.float64
                           if aoR_k.dtype == jnp.complex128
                           else jnp.float32)
    elif xc_grids != "uniform" and not xc_grids.startswith("becke"):
        raise ValueError(f"unknown xc_grids {xc_grids!r} "
                         "(expected 'uniform' or 'becke[:n_rad,n_theta]')")

    S, hcore, X = system.S, system.hcore, system.X

    def eig_all(F_k):
        es, cs = [], []
        for k in range(nk):
            Fp = X[k].conj().T @ F_k[k] @ X[k]
            e, u = np.linalg.eigh(Fp)
            es.append(e)
            cs.append(X[k] @ u)
        return es, cs

    def make_dm(mo_c, occs):
        return np.stack([(c * o) @ c.conj().T for c, o in zip(mo_c, occs)])

    mo_e, mo_c = eig_all(hcore)
    occ_a = _occ_spin(mo_e, na * nk)
    occ_b = _occ_spin(mo_e, nb * nk) if nb > 0 else [np.zeros_like(o) for o in occ_a]
    dm_a = make_dm(mo_c, occ_a)
    dm_b = make_dm(mo_c, occ_b)

    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False

    for it in range(max_cycle):
        dm_t = dm_a + dm_b
        vj = np.asarray(
            fftdf_k.get_j_kpts(aoR_k, jnp.asarray(dm_t, aoR_k.dtype), coulG,
                               mesh, weight), dtype=np.complex128)
        veff_a = vj.copy()
        veff_b = vj.copy()
        e_xc = 0.0
        if xcspec is not None:
            e_xc, vxc_a, vxc_b = vxc_spin_kpts(
                xc_aoR_k, xc_grad_k, dm_a, dm_b, xc_w, xcspec)
            veff_a += vxc_a
            veff_b += vxc_b
        e_k = 0.0
        if need_k:
            if get_k_spin is not None:
                vka = np.array(get_k_spin(dm_a), dtype=np.complex128)
                vkb = np.array(get_k_spin(dm_b), dtype=np.complex128)
            else:
                def _k_fft(dm_s):
                    dmj = jnp.asarray(dm_s, aoR_k.dtype)
                    vk = hyb * fftdf_k.get_k_kpts(
                        aoR_k, dmj, coulG_pairs, expmikr, mesh, kweight) \
                        if hyb != 0 else 0.0
                    if rsh:
                        vk = vk + (alpha - hyb) * fftdf_k.get_k_kpts(
                            aoR_k, dmj, coulG_pairs_lr, expmikr, mesh,
                            kweight)
                    return vk

                vka = np.array(_k_fft(dm_a), dtype=np.complex128)
                vkb = np.array(_k_fft(dm_b), dtype=np.complex128)
            if exxdiv == "ewald":
                for k in range(nk):
                    vka[k] += mad_add * (S[k] @ dm_a[k] @ S[k])
                    vkb[k] += mad_add * (S[k] @ dm_b[k] @ S[k])
            veff_a -= vka
            veff_b -= vkb
            e_k = -0.5 * (
                np.einsum("kij,kji->", dm_a, vka)
                + np.einsum("kij,kji->", dm_b, vkb)
            ).real / nk

        Fa = hcore + veff_a
        Fb = hcore + veff_b
        err = np.concatenate([
            np.concatenate([
                (X[k].conj().T @ (S[k] @ d[k] @ F[k] - F[k] @ d[k] @ S[k]) @ X[k]).ravel()
                for k in range(nk)
            ])
            for d, F in ((dm_a, Fa), (dm_b, Fb))
        ])
        Fab = diis.update(np.stack([Fa, Fb]), err)
        Fa, Fb = Fab[0], Fab[1]

        ea, ca = eig_all(Fa)
        eb, cb = eig_all(Fb)
        occ_a = _occ_spin(ea, na * nk)
        occ_b = _occ_spin(eb, nb * nk) if nb > 0 else [np.zeros_like(o) for o in eb]
        dm_a_new = make_dm(ca, occ_a)
        dm_b_new = make_dm(cb, occ_b)

        e1 = np.einsum("kij,kji->", dm_t, hcore).real / nk
        ecoul = 0.5 * np.einsum("kij,kji->", dm_t, vj).real / nk
        e_tot = float(e1 + ecoul + e_xc + e_k + system.e_nuc)
        de = abs(e_tot - e_last)
        if verbose:
            print(f"cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}")
        if de < conv_tol and np.linalg.norm(err) / err.size**0.5 < np.sqrt(conv_tol):
            conv = True
            dm_a, dm_b = dm_a_new, dm_b_new
            break
        dm_a, dm_b = dm_a_new, dm_b_new
        e_last = e_tot

    return {
        "e_tot": e_tot,
        "mo_energy": (ea, eb),
        "mo_coeff": (ca, cb),
        "mo_occ": (np.asarray(occ_a), np.asarray(occ_b)),
        "nelec": (na, nb),
        "dm": (dm_a, dm_b),
        "converged": conv,
        "niter": it + 1,
    }
