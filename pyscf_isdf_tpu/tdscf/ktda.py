"""k-point TDA (vertical q=0 excitations) for KRHF/KRKS ground states.

Matrix-free A.x over complex k-resolved amplitudes x[k, i, a] (reference
analog: pyscf/pbc/tdscf/krks.py). With Bloch orbitals the conjugation
pattern matters; for the Hermitian TDA operator

    (A x)[k,ia] = (e_a(k) - e_i(k)) x[k,ia]
      + fac * w sum_g Mo[k,g,i] conj(Mv[k,g,a]) V[rho_x](g)     (Coulomb)
      - hyb  * [ Uv_k^H (M_x o conj(W_q)) Uo_k ]^T_{ia} / nk     (exchange)
      + w sum_g Mo[k,g,i] conj(Mv[k,g,a]) f_xc(g) rho_x(g)       (XC, LDA)

with the q=0 transition density rho_x = (1/nk) sum_k diag(conj(Mo) x Mv),
the exchange through the k-ISDF factors (M_x = Uv_k' x^T Uo_k'^H at the
interpolation points), and the adiabatic LDA kernel f_xc = d v_rho / d rho
(singlet: f_aa + f_ab; triplet: f_aa - f_ab) from autodiff.

Validated against the Gamma-point TDA (nk=1) and the folded supercell
spectrum (tests/test_tdscf.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_isdf_tpu.df import fftdf
from pyscf_isdf_tpu.ops.xc import XCSpec
from pyscf_isdf_tpu.tdscf.response import davidson


def _fxc_lda_channels(xcspec: XCSpec, rho):
    """(f_singlet, f_triplet) adiabatic LDA kernels on the grid."""
    def f(ra, rb):
        exc, _, _ = xcspec.exc_vxc_spin(jnp.array([ra]), jnp.array([rb]))
        return ((ra + rb) * exc)[0]

    h = jax.hessian(f, argnums=(0, 1))

    def per_point(r):
        hh = h(r / 2, r / 2)
        faa, fab = hh[0][0], hh[0][1]
        return faa + fab, faa - fab

    return jax.vmap(per_point)(jnp.maximum(rho, 1e-12))


def make_ktda_matvec(system, kscf_res, xc=None, singlet=True, isdfk=None,
                     nocc=None):
    """Return (matvec(x (nk,no,nv) complex), diag) for the k-point TDA."""
    nk = len(system.kpts)
    mo_e = [np.asarray(e) for e in kscf_res["mo_energy"]]
    mo_c = [jnp.asarray(c) for c in kscf_res["mo_coeff"]]
    if nocc is None:
        nocc = system.cell.nelectron // 2
    xcspec = XCSpec(xc) if xc is not None else None
    hyb = 1.0 if xcspec is None else xcspec.hyb
    fac = 2.0 if singlet else 0.0
    if xcspec is not None and xcspec.family != "lda":
        raise NotImplementedError("k-TDA: LDA kernel only (GGA planned)")
    if hyb > 0 and isdfk is None:
        raise ValueError("k-TDA with exact exchange needs a built ISDFK")

    aoR_k = system.aoR_k
    cdt = aoR_k.dtype
    Co = jnp.stack([c[:, :nocc] for c in mo_c]).astype(cdt)
    Cv = jnp.stack([c[:, nocc:] for c in mo_c]).astype(cdt)
    Mo = jnp.einsum("kgm,kmi->kgi", aoR_k, Co)
    Mv = jnp.einsum("kgm,kma->kga", aoR_k, Cv)
    coulG = jnp.asarray(system.coulG)
    mesh, w = system.mesh, system.weight

    diag = np.stack([
        (mo_e[k][nocc:][None, :] - mo_e[k][:nocc][:, None]) for k in range(nk)
    ])

    fxc = None
    if xcspec is not None:
        dm0 = jnp.asarray(np.asarray(kscf_res["dm"]), cdt)
        t = jnp.einsum("kgi,kij->kgj", aoR_k, dm0)
        rho0 = jnp.einsum("kgj,kgj->g", t, aoR_k.conj()).real / nk
        fs, ft = _fxc_lda_channels(xcspec, rho0)
        fxc = fs if singlet else ft

    if hyb > 0:
        Uo = jnp.einsum("kpm,kmi->kpi", isdfk.Ug, Co)   # (nk, nip, no)
        Uv = jnp.einsum("kpm,kma->kpa", isdfk.Ug, Cv)   # (nk, nip, nv)

    @jax.jit
    def _matvec(x):
        xk = x.astype(cdt)
        out = jnp.asarray(diag, x.real.dtype) * x

        # q=0 transition density rho_x(g) = (1/nk) sum conj(phi_j) phi_b x_jb
        rho_x = jnp.einsum("kgi,kia,kga->g", Mo.conj(), xk, Mv) / nk

        if fac != 0.0:
            vG = coulG * fftdf.fft3(rho_x, mesh)
            vR = fftdf.ifft3(vG, mesh)
            out = out + fac * w * jnp.einsum("kgi,g,kga->kia", Mo, vR, Mv.conj())

        if hyb > 0:
            qmap = isdfk.qmap
            Wq = isdfk.Wq
            kx = []
            for k1 in range(nk):
                acc = jnp.zeros((Uv.shape[2], Uo.shape[2]), cdt)   # (nv, no)
                for k2 in range(nk):
                    Mx = Uv[k2] @ xk[k2].T @ Uo[k2].conj().T       # (nip, nip)
                    W = Wq[qmap[k2, k1]]
                    acc = acc + Uv[k1].conj().T @ (Mx * W.conj()) @ Uo[k1]
                kx.append(acc.T / nk)                              # (no, nv)
            out = out - hyb * jnp.stack(kx)

        if fxc is not None:
            out = out + w * jnp.einsum(
                "kgi,g,kga->kia", Mo, fxc * rho_x, Mv.conj())
        return out

    return _matvec, diag


def ktda_davidson(system, kscf_res, xc=None, nstates=3, singlet=True,
                  isdfk=None, tol=1e-7):
    """Iterative k-point TDA excitation energies.

    Works in the realified space (real/imag stacked); complex states appear
    with doubled multiplicity, eigenvalues are unaffected.
    """
    matvec, diag = make_ktda_matvec(system, kscf_res, xc=xc, singlet=singlet,
                                    isdfk=isdfk)

    def mv_real(z):
        x = z[0] + 1j * z[1]
        out = matvec(jnp.asarray(x))
        return jnp.stack([out.real, out.imag])

    diag2 = np.stack([diag, diag])
    return davidson(mv_real, diag2, nstates=nstates, tol=tol)
