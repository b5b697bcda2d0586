"""k-point sampled closed-shell SCF (KRHF / KRKS).

Complex Bloch-orbital version of :mod:`pyscf_isdf_tpu.scf.hf`
(reference semantics: pyscf/pbc/scf/khf.py:409-757 — global Fermi filling
across k-points, 1/nk-weighted energy traces, per-k Fock eigensolves).
Host-side float64 setup per k-point; per-cycle J/K/Vxc on device.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.cell import Cell
from pyscf_isdf_tpu.df import fftdf_k
from pyscf_isdf_tpu.ops import coulomb, pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.ops.ft_ao import overlap_and_kinetic
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.scf import occupations as occupations_mod
from pyscf_isdf_tpu.scf.diis import DIIS
from pyscf_isdf_tpu.utils.misc import device_complex, host_complex


@dataclass(frozen=True, eq=False)
class KSCFSystem:
    cell: Cell
    kpts: np.ndarray          # (nk, 3)
    S: np.ndarray             # (nk, nao, nao) complex
    hcore: np.ndarray         # (nk, nao, nao) complex
    X: np.ndarray             # (nk, nao, nrank) orthogonalizers
    aoR_k: jnp.ndarray        # (nk, ng, nao) complex device
    coulG: np.ndarray         # (ng,) q=0 kernel
    coulG_pairs: np.ndarray   # (nk, nk, ng)
    expmikr: np.ndarray       # (nk, nk, ng) complex
    madelung: float
    e_nuc: float
    mesh: tuple
    weight: float
    nelec_tot: int            # electrons in the full k-sampled supercell
    ae: bool = False          # analytic all-electron S/hcore (df/aegdf.py)
    ae_omega: float = 0.4     # SR/LR split of the analytic build


def build_kscf_system(cell: Cell, kpts, dtype=None, ae: bool = False,
                      ae_omega: float = 0.4) -> KSCFSystem:
    """``ae=True``: ALL-ELECTRON k-point system — per-k S and hcore from
    the analytic mesh-free engines (df/aegdf.ae_hcore_kpts: Bloch-phased
    McMurchie-Davidson SR sums + G-sphere LR), the regime the reference
    serves with GDF/RSDF (pyscf/pbc/df/rsdf.py:74). aoR_k is still
    collocated for XC/FFT consumers; aegdf J/K never touch the mesh."""
    if dtype is None:
        dtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    kpts = np.reshape(np.asarray(kpts, dtype=np.float64), (-1, 3))
    nk = len(kpts)

    ae_S = ae_h = None
    if ae:
        from pyscf_isdf_tpu.df import aegdf as _ae

        ae_S, ae_h = _ae.ae_hcore_kpts(cell, kpts, ae_omega)

    S_k, h_k, X_k, ao_k = [], [], [], []
    for ik, k in enumerate(kpts):
        aoRk = eval_ao_numpy(cell, kpt=k)
        if ae:
            S, h = ae_S[ik], ae_h[ik]
        else:
            S, T = overlap_and_kinetic(cell, kpt=k)
            if cell.pseudos:
                vloc, _ = pp_ops.get_vpploc(cell, aoRk)
                vpp = vloc + pp_ops.get_vppnl(cell, kpt=k)
            else:
                vpp = pp_ops.get_nuc(cell, aoRk)
            S = np.asarray(S, dtype=np.complex128)
            h = np.asarray(T, dtype=np.complex128) + vpp
        w, v = np.linalg.eigh(S)
        keep = w > 1e-12
        X = v[:, keep] / np.sqrt(w[keep])
        S_k.append(S)
        h_k.append(h)
        X_k.append(X)
        ao_k.append(aoRk)

    coulG = coulomb.get_coulG(cell)
    coulG_pairs, expmikr = fftdf_k.make_k_kernels(cell, kpts)
    return KSCFSystem(
        cell=cell,
        kpts=kpts,
        S=np.stack(S_k),
        hcore=np.stack(h_k),
        X=np.stack(X_k),
        # shipped as (re, im) parts — complex device_put is UNIMPLEMENTED
        # on the tunneled axon TPU runtime (utils/misc.device_complex)
        aoR_k=device_complex(np.stack(ao_k), dtype),
        coulG=coulG,
        coulG_pairs=coulG_pairs,
        expmikr=expmikr,
        madelung=coulomb.madelung(cell, kpts),
        e_nuc=coulomb.ewald(cell),
        mesh=tuple(cell.mesh),
        weight=cell.grid_weight,
        nelec_tot=cell.nelectron * nk,
        ae=ae,
        ae_omega=ae_omega,
    )


def _global_occ(mo_e_k, nocc_tot):
    """Fermi filling across all k-points (khf.py:178-214).

    Exactly nocc_tot orbitals filled (argsort, not a <=fermi threshold,
    which overfills on a degenerate Fermi level).
    """
    return occupations_mod.exact_count_occ(mo_e_k, nocc_tot, scale=2.0)


def vxc_kpts(aoR_k, ao_grad_k, dm, weight, xcspec):
    """k-averaged XC quadrature: (e_xc, vxc_k (nk,nao,nao) np.complex128).

    The density is the k-average rho = (1/nk) sum_k Re tr(D_k ao ao*);
    GGA rungs add the spectral AO gradients (ao_grad_k), mGGA the tau
    term.  Shared by the SCF loop and post-SCF consumers (GW needs
    v_mf = vxc on the converged density).  ``weight`` is either the
    uniform-mesh scalar or a per-point (ng,) vector (Becke atomic grids,
    ops/becke.py) — the contraction is the same dense program either
    way."""
    nk = aoR_k.shape[0]
    is_gga = xcspec.family == "gga"
    is_mgga = xcspec.family == "mgga"
    dmj = device_complex(dm, aoR_k.dtype)
    hi = jax.lax.Precision.HIGHEST   # TPU DEFAULT matmul is bf16
    t = jnp.einsum("kgi,kij->kgj", aoR_k, dmj,
                   precision=hi)                      # (nk, ng, nao)
    rho = jnp.einsum("kgj,kgj->g", t, aoR_k.conj(),
                     precision=hi).real / nk
    rho_j = jnp.maximum(rho, 1e-30)
    w_g = jnp.broadcast_to(jnp.asarray(weight, rho_j.dtype), rho_j.shape)
    if is_gga or is_mgga:
        # grad rho = (2/nk) Re sum_k conj(t) . grad(ao)
        grho = 2.0 / nk * jnp.einsum(
            "kgj,kxgj->xg", t.conj(), ao_grad_k).real  # (3, ng)
        sigma_g = jnp.maximum(jnp.sum(grho * grho, axis=0), 1e-30)
        vtau = None
        if is_mgga:
            tg = jnp.einsum("kxgi,kij->kxgj", ao_grad_k, dmj)
            tau_g = jnp.maximum(0.5 / nk * jnp.einsum(
                "kxgj,kxgj->g", tg, ao_grad_k.conj()).real, 1e-30)
            exc, vrho, vsigma, vtau = xcspec.exc_vxc_mgga(
                rho_j, sigma_g, tau_g)
        else:
            exc, vrho, vsigma = xcspec.exc_vxc(rho_j, sigma_g)
        e_xc = float(jnp.sum(w_g * rho_j * exc))
        # V_k = w [conj(ao)^T (vrho/2 ao + 2 vsigma grad_rho.grad_ao) + h.c.]
        aow = 0.5 * vrho[:, None] * aoR_k + 2.0 * jnp.einsum(
            "xg,g,kxgi->kgi", grho, vsigma, ao_grad_k)
        half = jnp.einsum("kgi,kgj->kij", aoR_k.conj(),
                          w_g[:, None] * aow, precision=hi)
        vxc = half + half.conj().transpose(0, 2, 1)
        if vtau is not None:
            vxc = vxc + 0.5 * jnp.einsum(
                "kxgi,g,kxgj->kij", ao_grad_k.conj(), w_g * vtau,
                ao_grad_k)
        vxc = host_complex(vxc)
    else:
        exc, vrho, _ = xcspec.exc_vxc(rho_j)
        e_xc = float(jnp.sum(w_g * rho_j * exc))
        vxc = host_complex(
            jnp.einsum("kgi,g,kgj->kij", aoR_k.conj(), w_g * vrho,
                       aoR_k, precision=hi)
        )
    return e_xc, vxc


def kscf_kernel(
    system: KSCFSystem,
    xc: Optional[str] = None,
    exxdiv: str = "ewald",
    max_cycle: int = 60,
    conv_tol: float = 1e-10,
    diis_space: int = 8,
    get_jk=None,
    df: str = "fftdf",
    isdf_c: float = 8.0,
    isdf_precision: Optional[str] = None,
    verbose: bool = False,
    sigma: float = 0.0,
    smearing_method: str = "fermi",
    hubbard=None,
    xc_grids: str = "uniform",
):
    """Run the k-point SCF to convergence. xc=None -> KRHF, else KRKS.

    ``df='isdf'`` builds the k-point ISDF factorization (shared IPs,
    per-q W kernels) and routes exchange through GEMM-cost
    :func:`pyscf_isdf_tpu.df.isdf_k.get_k_kpts` — the reference's
    ``with_df`` swap (pyscf/pbc/scf/khf.py:409 + hf.py:810-821) as a flag.
    J stays on the exact FFT path either way.

    ``sigma > 0`` enables finite-temperature (smeared) occupations; the
    result then also carries ``entropy``, ``mu`` and the free energy
    ``e_free = e_tot - sigma * entropy`` (fermi) following the reference
    addons conventions.

    ``hubbard`` enables DFT+U (reference pyscf/pbc/dft/krkspu.py): a list
    of (atom_index_or_symbol, l, U_hartree) subspace specs.
    """
    if isdf_precision is not None:
        if isdf_precision != "dd":
            raise ValueError(f"unknown isdf_precision {isdf_precision!r}")
        if df not in ("isdf", "isdf_q"):
            raise ValueError(
                "isdf_precision='dd' needs an ISDF engine "
                f"(df='isdf' or 'isdf_q'); got df={df!r}")
    cell = system.cell
    nk = len(system.kpts)
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    alpha = hyb if xcspec is None else xcspec.alpha
    omega = 0.0 if xcspec is None else xcspec.omega
    rsh = omega != 0.0
    need_k = hyb > 0 or alpha > 0
    k_scale = 1.0 if rsh else hyb
    mad_add = system.madelung
    if rsh:
        mad_add = hyb * system.madelung \
            + (alpha - hyb) * coulomb.madelung_omega(cell, system.kpts, omega)
    is_gga = xcspec is not None and xcspec.family == "gga"
    is_mgga = xcspec is not None and xcspec.family == "mgga"

    aoR_k = system.aoR_k
    mesh = system.mesh
    weight = system.weight
    coulG = jnp.asarray(system.coulG)
    nocc_tot = system.nelec_tot // 2

    ao_grad_k = None
    if is_gga or is_mgga:
        from pyscf_isdf_tpu.ops.ao_eval import ao_gradient_fft_k

        coords = jnp.asarray(cell.uniform_grid())
        Gv = jnp.asarray(cell.get_Gv())
        ao_grad_k = jnp.stack([
            ao_gradient_fft_k(aoR_k[k], mesh, Gv,
                              jnp.asarray(system.kpts[k]), coords)
            for k in range(nk)
        ])  # (nk, 3, ng, nao)

    # XC-quadrature seam: the uniform mesh by default, or the opt-in
    # Becke atomic grid (ops/becke.py; reference BeckeGrids + KNumInt,
    # pyscf/pbc/dft/gen_grid.py:141-234) — only the arrays fed to
    # vxc_kpts change, J/K stay on their own engines
    xc_aoR_k, xc_grad_k, xc_w = aoR_k, ao_grad_k, weight
    if xcspec is not None and xc_grids.startswith("becke"):
        from pyscf_isdf_tpu.ops import becke as becke_mod

        if ":" in xc_grids:
            n_rad, n_theta = map(int, xc_grids.split(":", 1)[1].split(","))
            bg = becke_mod.build_becke_grids(cell, n_rad=n_rad,
                                             n_theta=n_theta)
        else:
            bg = becke_mod.build_becke_grids(cell)
        need_g = is_gga or is_mgga
        pairs = [becke_mod.eval_ao_and_grad(cell, bg.coords,
                                            kpt=system.kpts[k],
                                            need_grad=need_g)
                 for k in range(nk)]
        xc_aoR_k = jnp.stack([p[0] for p in pairs]).astype(aoR_k.dtype)
        xc_grad_k = (jnp.stack([p[1] for p in pairs]).astype(aoR_k.dtype)
                     if need_g else None)
        xc_w = jnp.asarray(bg.weights, dtype=jnp.float64
                           if aoR_k.dtype == jnp.complex128
                           else jnp.float32)
    elif xc_grids != "uniform" and not xc_grids.startswith("becke"):
        raise ValueError(f"unknown xc_grids {xc_grids!r} "
                         "(expected 'uniform' or 'becke[:n_rad,n_theta]')")

    internal_jk = get_jk is None
    if get_jk is None and df == "aegdf":
        # analytic all-electron k-point DF (df/aegdf.build_ae_gdf_kpts):
        # J AND K from the whitened per-q fit tensors — the with_df
        # engine that replaced the former inline aekhf_kernel loop
        # (VERDICT r4 next #2); reference seam: rs_density_fit,
        # pyscf/pbc/scf/hf.py:810-821.
        from pyscf_isdf_tpu.df import aegdf as _ae
        from pyscf_isdf_tpu.df import gdf as gdf_mod

        if not system.ae:
            raise ValueError("df='aegdf' needs build_kscf_system(ae=True) "
                             "(analytic S/hcore) — the frontend "
                             "density_fit('aegdf') sets this up")
        if rsh:
            raise NotImplementedError("aegdf + RSH exchange: build the "
                                      "LR-metric tensor first")
        ae_kgdf = _ae.build_ae_gdf_kpts(cell, system.kpts,
                                        omega=system.ae_omega)

        def get_jk(dm_k, with_k, C_w_k=None):
            vj, vk = gdf_mod.get_jk_kpts(
                ae_kgdf, [device_complex(d, aoR_k.dtype) for d in dm_k])
            return vj, (vk if with_k else None)

    if get_jk is None and df == "gdf":
        # k-point Gaussian density fitting (df/gdf.py G-space build)
        from pyscf_isdf_tpu.df import gdf as gdf_mod

        kgdf = gdf_mod.build_gdf_kpts(cell, system.aoR_k, system.kpts,
                                      mesh, weight)
        if rsh:
            kgdf_lr = gdf_mod.build_gdf_kpts(cell, system.aoR_k,
                                             system.kpts, mesh, weight,
                                             omega=omega)

            def get_jk(dm_k, with_k, C_w_k=None):
                dmj = device_complex(dm_k, aoR_k.dtype)
                vj, vk_full = gdf_mod.get_jk_kpts(kgdf, dmj)
                if not with_k:
                    return vj, None
                _, vk_lr = gdf_mod.get_jk_kpts(kgdf_lr, dmj)
                return vj, hyb * vk_full + (alpha - hyb) * vk_lr
        else:
            def get_jk(dm_k, with_k, C_w_k=None):
                vj, vk = gdf_mod.get_jk_kpts(kgdf, device_complex(
                    dm_k, aoR_k.dtype))
                return vj, (vk if with_k else None)

    if get_jk is None:
        if df not in ("fftdf", "isdf", "isdf_q"):
            raise ValueError(f"unknown df engine {df!r}: use 'fftdf', "
                             "'isdf', 'isdf_q', 'gdf' or 'aegdf'")
        ex_kern = exxdiv if exxdiv not in (None, "ewald") else None
        if df == "isdf_q" and need_k:
            # q-resolved k-point ISDF (df/isdf_q.py): one primitive-cell
            # IP set, per-momentum-transfer complex interpolation
            # vectors; robust-fit exchange (error quadratic in the fit
            # residual). n_ip = isdf_c * nao TOTAL (the supercell-
            # equivalent compression), vs isdf_c * nk * nao for the
            # shared-xi 'isdf' engine.
            from pyscf_isdf_tpu.df import isdf_q as isdf_q_mod

            isdfq_full = isdf_q_mod.build_isdf_q(
                cell, aoR_k, system.kpts, c=isdf_c, exxdiv=ex_kern,
                keep_x=True, precision=isdf_precision)
            if rsh:
                isdfq_lr = isdf_q_mod.build_isdf_q(
                    cell, aoR_k, system.kpts, c=isdf_c, omega=omega,
                    keep_x=True, precision=isdf_precision)

                def get_k_fn(dmj):
                    return hyb * isdf_q_mod.get_k_kpts_robust(
                        isdfq_full, dmj, aoR_k, weight) \
                        + (alpha - hyb) * isdf_q_mod.get_k_kpts_robust(
                            isdfq_lr, dmj, aoR_k, weight)
            else:
                def get_k_fn(dmj):
                    return isdf_q_mod.get_k_kpts_robust(
                        isdfq_full, dmj, aoR_k, weight)
        elif df == "isdf" and need_k:
            from pyscf_isdf_tpu.df import isdf_k as isdf_k_mod

            if rsh:
                isdfk_full = isdf_k_mod.build_isdf_k(
                    cell, aoR_k, system.kpts, c=isdf_c, exxdiv=ex_kern,
                    precision=isdf_precision)
                isdfk_lr = isdf_k_mod.build_isdf_k(
                    cell, aoR_k, system.kpts, c=isdf_c, omega=omega,
                    precision=isdf_precision)

                def get_k_fn(dmj):
                    return hyb * isdf_k_mod.get_k_kpts(isdfk_full, dmj) \
                        + (alpha - hyb) * isdf_k_mod.get_k_kpts(isdfk_lr, dmj)
            else:
                isdfk = isdf_k_mod.build_isdf_k(
                    cell, aoR_k, system.kpts, c=isdf_c, exxdiv=ex_kern,
                    precision=isdf_precision)

                def get_k_fn(dmj):
                    return isdf_k_mod.get_k_kpts(isdfk, dmj)
        elif need_k:
            if ex_kern is not None:
                cp, _ = fftdf_k.make_k_kernels(cell, system.kpts, exxdiv=exxdiv)
                coulG_pairs = jnp.asarray(cp)
            else:
                coulG_pairs = jnp.asarray(system.coulG_pairs)
            coulG_pairs_lr = None
            if rsh:
                cpl, _ = fftdf_k.make_k_kernels(cell, system.kpts,
                                                omega=omega)
                coulG_pairs_lr = jnp.asarray(cpl)
            expmikr = device_complex(system.expmikr, aoR_k.dtype)
            kweight = weight / nk

            def get_k_fn(dmj):
                if not rsh:
                    return fftdf_k.get_k_kpts(aoR_k, dmj, coulG_pairs,
                                              expmikr, mesh, kweight)
                return hyb * fftdf_k.get_k_kpts(
                    aoR_k, dmj, coulG_pairs, expmikr, mesh, kweight) \
                    + (alpha - hyb) * fftdf_k.get_k_kpts(
                        aoR_k, dmj, coulG_pairs_lr, expmikr, mesh, kweight)
        else:
            get_k_fn = None

        occ_k_capable = df == "fftdf" and not rsh and ex_kern is None

        def get_jk(dm_k, with_k, C_w_k=None):
            dmj = device_complex(dm_k, aoR_k.dtype)
            vj = fftdf_k.get_j_kpts(aoR_k, dmj, coulG, mesh, weight)
            if not with_k:
                return vj, None
            if C_w_k is not None and occ_k_capable:
                # occupied-MO fast exchange (reference tagged-DM path,
                # fft_jk.py:235-259): nao*nocc FFTs per (k1,k2) block
                mo_w_k = jnp.einsum(
                    "kgm,kmi->kgi", aoR_k,
                    device_complex(C_w_k, aoR_k.dtype))
                vk = fftdf_k.get_k_kpts_occ(
                    aoR_k, mo_w_k, coulG_pairs, expmikr, mesh, kweight)
            else:
                vk = get_k_fn(dmj)
            return vj, vk

    S, hcore, X = system.S, system.hcore, system.X

    hub = None
    if hubbard:
        from pyscf_isdf_tpu.scf.dftu import HubbardU

        hub = HubbardU(cell, S, hubbard)

    def eig_all(F_k):
        es, cs = [], []
        for k in range(nk):
            Fp = X[k].conj().T @ F_k[k] @ X[k]
            e, u = np.linalg.eigh(Fp)
            es.append(e)
            cs.append(X[k] @ u)
        return es, cs

    entropy = 0.0
    mu = None

    def occupations(mo_e):
        nonlocal entropy, mu
        if sigma and sigma > 0:
            from pyscf_isdf_tpu.scf.occupations import smearing_occ_rhf
            occs, entropy, mu = smearing_occ_rhf(
                mo_e, system.nelec_tot, sigma, smearing_method)
            return occs
        return _global_occ(mo_e, nocc_tot)

    mo_e, mo_c = eig_all(hcore)
    occs = occupations(mo_e)
    dm = np.stack([
        (c * o) @ c.conj().T for c, o in zip(mo_c, occs)
    ])

    diis = DIIS(space=diis_space)
    e_last = 0.0
    conv = False

    C_w_k = None
    for it in range(max_cycle):
        if internal_jk:
            vj, vk = get_jk(dm, need_k, C_w_k)
        else:
            vj, vk = get_jk(dm, need_k)
        vj = host_complex(vj)
        veff = vj.copy()
        e_xc = 0.0
        if xcspec is not None:
            e_xc, vxc = vxc_kpts(xc_aoR_k, xc_grad_k, dm, xc_w, xcspec)
            veff += vxc
        e_k = 0.0
        if need_k:
            vk = host_complex(vk)
            if exxdiv == "ewald":
                for k in range(nk):
                    vk[k] += mad_add * (S[k] @ dm[k] @ S[k])
            veff -= 0.5 * k_scale * vk
            e_k = -0.25 * k_scale * np.einsum("kij,kji->", dm, vk).real / nk

        e_u = 0.0
        if hub is not None:
            e_u, v_u = hub.energy_and_potential(dm)
            veff += v_u

        F = hcore + veff
        err = np.concatenate([
            (X[k].conj().T @ (S[k] @ dm[k] @ F[k] - F[k] @ dm[k] @ S[k]) @ X[k]).ravel()
            for k in range(nk)
        ])
        F = diis.update(F, err)

        mo_e, mo_c = eig_all(F)
        occs = occupations(mo_e)
        dm_new = np.stack([(c * o) @ c.conj().T for c, o in zip(mo_c, occs)])
        # occupied-MO exchange next cycle: only for a uniform integer
        # fill (per-k counts must agree for the static (nk,nao,no) stack)
        C_w_k = None
        if not (sigma and sigma > 0):
            counts = [int(np.sum(o > 0)) for o in occs]
            if len(set(counts)) == 1 and counts[0] > 0:
                no_k = counts[0]
                C_w_k = np.stack([
                    c[:, :no_k] * np.sqrt(o[:no_k])
                    for c, o in zip(mo_c, occs)
                ])

        e1 = np.einsum("kij,kji->", dm, hcore).real / nk
        ecoul = 0.5 * np.einsum("kij,kji->", dm, vj).real / nk
        e_tot = float(e1 + ecoul + e_xc + e_k + e_u + system.e_nuc)
        de = abs(e_tot - e_last)
        err_norm = np.linalg.norm(err) / max(1, err.size) ** 0.5
        if verbose:
            print(f"cycle {it:3d}  E = {e_tot:.12f}  dE = {de:.2e}  |err| = {err_norm:.2e}")
        if de < conv_tol and err_norm < np.sqrt(conv_tol):
            conv = True
            dm = dm_new
            break
        dm = dm_new
        e_last = e_tot

    return {
        "e_tot": e_tot,
        "mo_energy": mo_e,
        "mo_coeff": mo_c,
        "mo_occ": occs,
        "dm": dm,
        "converged": conv,
        "niter": it + 1,
        "entropy": entropy,
        "mu": mu,
        "e_free": e_tot - sigma * entropy if sigma else e_tot,
    }
