"""pyscf-style object front end.

Thin OO sugar over the functional kernels so reference users keep their
workflow (`mf = RKS(cell); mf.xc = 'pbe'; mf.kernel()`), including the
``with_df``-style ISDF swap via ``density_fit('isdf')``. The functional
API (scf.build_scf_system / scf_kernel) remains the primary interface.
"""
from __future__ import annotations

import numpy as np

from pyscf_isdf_tpu.cell import Cell
from pyscf_isdf_tpu.scf import hf as _hf
from pyscf_isdf_tpu.scf import khf as _khf
from pyscf_isdf_tpu.scf import uhf as _uhf
from pyscf_isdf_tpu.scf import rohf as _rohf
from pyscf_isdf_tpu.scf.bands import get_bands as _get_bands


class _MeanField:
    """Shared driver state for the Gamma-point mean-field classes."""

    xc: str | None = None

    def __init__(self, cell: Cell, xc=None, exxdiv="ewald"):
        self.cell = cell
        self.xc = xc
        self.exxdiv = exxdiv
        self.conv_tol = 1e-9
        self.max_cycle = 60
        self.df = "fftdf"
        self.isdf_c = 8.0
        self.isdf_precision = None
        self.ae_omega = 0.4
        self.sigma = 0.0
        self.smearing_method = "fermi"
        self.xc_grids = "uniform"   # 'becke' = atomic-grid XC quadrature
        self.verbose = False
        self._system = None
        self._res = None

    def smearing(self, sigma, method="fermi"):
        """Finite-temperature occupations (reference addons.py:216 applies
        to every SCF class, Gamma point included)."""
        self.sigma = sigma
        self.smearing_method = method
        return self

    @property
    def system(self):
        if self._system is None:
            self._system = _hf.build_scf_system(
                self.cell, ae=(self.df == "aegdf"), ae_omega=self.ae_omega)
        return self._system

    def density_fit(self, kind: str = "isdf", c: float = 8.0,
                    precision: str | None = None, omega: float = 0.4):
        """Switch the exchange engine (the reference's with_df swap).

        ``kind='aegdf'`` selects the analytic ALL-ELECTRON engine
        (df/aegdf.py: McMurchie-Davidson SR lattice sums + G-sphere LR;
        the reference's GDF/RSDF regime, pyscf/pbc/scf/hf.py:810-821
        density_fit/rs_density_fit) — S/hcore switch to the mesh-free
        analytic builds and J/K come from the whitened fit tensors.
        ``omega`` is its SR/LR split (result is w-independent; the
        exactness check of tests/test_aegdf*.py).

        ``precision='dd'`` (any ISDF engine, Gamma or k-point) solves
        the interpolation vectors in on-device double-float — f64-grade
        build conditioning on an f32-only TPU, for certified-accuracy
        factorizations with no host staging (df/isdf.py _solve_xi_dd;
        df/isdf_q.py _build_q_dd; df/isdf_k.py _xi_dd)."""
        if kind == "aegdf" and self._system is not None                 and not self._system.ae:
            self._system = None     # rebuild with analytic S/hcore
        self.df = kind
        self.isdf_c = c
        self.isdf_precision = precision
        self.ae_omega = omega
        return self

    def _kernel(self):
        raise NotImplementedError

    def kernel(self):
        self._res = self._kernel()
        return self._res["e_tot"]

    run = kernel
    scf = kernel

    def kernel_jit(self, df=None, isdf_c=None):
        """Deployment-mode SCF: the fully jitted lax.while_loop driver
        (scf/jit_diis.py) — ONE device program per SCF, required on the
        tunneled TPU runtime where per-cycle host round-trips stall
        (restricted Gamma/k classes; LDA/GGA/mGGA/hybrid/RSH).

        Populates e_tot/dm/converged/niter; orbital quantities need the
        host-loop kernel()."""
        from pyscf_isdf_tpu.scf import jit_diis as _jd

        runner = (_jd.run_kscf_jit_diis if isinstance(self, _KMeanField)
                  else _jd.run_scf_jit_diis)
        e_tot, dm, niter, conv = runner(
            self.system, xc=self.xc, exxdiv=self.exxdiv,
            df=df if df is not None else self.df,
            isdf_c=isdf_c if isdf_c is not None else self.isdf_c,
            max_cycle=self.max_cycle, conv_tol=self.conv_tol)
        self._res = {"e_tot": e_tot, "dm": dm, "converged": conv,
                     "niter": niter}
        return e_tot

    def __getattr__(self, name):
        res = self.__dict__.get("_res")
        if res is not None and name in res:
            return res[name]
        raise AttributeError(name)

    def get_bands(self, kpts_band):
        return _get_bands(self.system, self._res, kpts_band, xc=self.xc)


class RHF(_MeanField):
    def __init__(self, cell, exxdiv="ewald"):
        super().__init__(cell, xc=None, exxdiv=exxdiv)

    def _kernel(self):
        return _hf.scf_kernel(self.system, xc=None, exxdiv=self.exxdiv,
                              conv_tol=self.conv_tol, max_cycle=self.max_cycle,
                              df=self.df, isdf_c=self.isdf_c,
                              isdf_precision=self.isdf_precision,
                              sigma=self.sigma,
                              smearing_method=self.smearing_method,
                              verbose=self.verbose)


class RKS(_MeanField):
    def __init__(self, cell, xc="lda,vwn", exxdiv="ewald"):
        super().__init__(cell, xc=xc, exxdiv=exxdiv)

    def _kernel(self):
        return _hf.scf_kernel(self.system, xc=self.xc, exxdiv=self.exxdiv,
                              conv_tol=self.conv_tol, max_cycle=self.max_cycle,
                              df=self.df, isdf_c=self.isdf_c,
                              isdf_precision=self.isdf_precision,
                              sigma=self.sigma,
                              smearing_method=self.smearing_method,
                              xc_grids=self.xc_grids,
                              verbose=self.verbose)


class UHF(_MeanField):
    def __init__(self, cell, exxdiv="ewald"):
        super().__init__(cell, xc=None, exxdiv=exxdiv)

    def _kernel(self):
        return _uhf.uhf_kernel(self.system, xc=None, exxdiv=self.exxdiv,
                               conv_tol=self.conv_tol,
                               max_cycle=self.max_cycle,
                               df=self.df, isdf_c=self.isdf_c,
                               isdf_precision=self.isdf_precision,
                               verbose=self.verbose)


class UKS(_MeanField):
    def __init__(self, cell, xc="lda,vwn", exxdiv="ewald"):
        super().__init__(cell, xc=xc, exxdiv=exxdiv)

    def _kernel(self):
        return _uhf.uhf_kernel(self.system, xc=self.xc, exxdiv=self.exxdiv,
                               conv_tol=self.conv_tol,
                               max_cycle=self.max_cycle,
                               df=self.df, isdf_c=self.isdf_c,
                               isdf_precision=self.isdf_precision,
                               xc_grids=self.xc_grids,
                               verbose=self.verbose)


class ROHF(_MeanField):
    def __init__(self, cell, exxdiv="ewald"):
        super().__init__(cell, xc=None, exxdiv=exxdiv)

    def _kernel(self):
        return _rohf.rohf_kernel(self.system, xc=None, exxdiv=self.exxdiv,
                                 conv_tol=self.conv_tol,
                                 max_cycle=self.max_cycle,
                                 verbose=self.verbose)


class _KMeanField(_MeanField):
    def __init__(self, cell, kpts, xc=None, exxdiv="ewald", symmetry=False):
        super().__init__(cell, xc=xc, exxdiv=exxdiv)
        self.kpts = np.reshape(np.asarray(kpts, dtype=np.float64), (-1, 3))
        self.symmetry = symmetry

    def _kernel_ibz(self):
        """IBZ-reduced SCF (space-group + time-reversal symmetry)."""
        from pyscf_isdf_tpu.scf.khf_ksymm import kscf_ibz_kernel

        return kscf_ibz_kernel(self.system, xc=self.xc, exxdiv=self.exxdiv,
                               conv_tol=self.conv_tol,
                               max_cycle=self.max_cycle,
                               df=self.df, isdf_c=self.isdf_c,
                               isdf_precision=self.isdf_precision,
                               sigma=self.sigma,
                               smearing_method=self.smearing_method,
                               verbose=self.verbose)

    @property
    def system(self):
        if self._system is None:
            self._system = _khf.build_kscf_system(
                self.cell, self.kpts, ae=(self.df == "aegdf"),
                ae_omega=self.ae_omega)
        return self._system

    def get_bands(self, kpts_band):
        return _get_bands(self.system, self._res, kpts_band, xc=self.xc)


class KRHF(_KMeanField):
    def __init__(self, cell, kpts, exxdiv="ewald", symmetry=False):
        super().__init__(cell, kpts, xc=None, exxdiv=exxdiv,
                         symmetry=symmetry)

    def _kernel(self):
        if self.symmetry:
            return self._kernel_ibz()
        return _khf.kscf_kernel(self.system, xc=None, exxdiv=self.exxdiv,
                                conv_tol=self.conv_tol,
                                max_cycle=self.max_cycle, sigma=self.sigma,
                                smearing_method=self.smearing_method,
                                df=self.df, isdf_c=self.isdf_c,
                                isdf_precision=self.isdf_precision,
                                verbose=self.verbose)


class KRKS(_KMeanField):
    def __init__(self, cell, kpts, xc="lda,vwn", exxdiv="ewald",
                 symmetry=False):
        super().__init__(cell, kpts, xc=xc, exxdiv=exxdiv, symmetry=symmetry)

    def _kernel(self):
        if self.symmetry:
            return self._kernel_ibz()
        return _khf.kscf_kernel(self.system, xc=self.xc, exxdiv=self.exxdiv,
                                conv_tol=self.conv_tol,
                                max_cycle=self.max_cycle, sigma=self.sigma,
                                smearing_method=self.smearing_method,
                                df=self.df, isdf_c=self.isdf_c,
                                isdf_precision=self.isdf_precision,
                                xc_grids=self.xc_grids,
                                verbose=self.verbose)


class KUHF(_KMeanField):
    def __init__(self, cell, kpts, exxdiv="ewald"):
        super().__init__(cell, kpts, xc=None, exxdiv=exxdiv)

    def _kernel(self):
        from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel

        return kuhf_kernel(self.system, xc=None, exxdiv=self.exxdiv,
                           conv_tol=self.conv_tol, max_cycle=self.max_cycle,
                           df=self.df, isdf_c=self.isdf_c,
                           isdf_precision=self.isdf_precision,
                           verbose=self.verbose)


class KUKS(_KMeanField):
    def __init__(self, cell, kpts, xc="lda,vwn", exxdiv="ewald"):
        super().__init__(cell, kpts, xc=xc, exxdiv=exxdiv)

    def _kernel(self):
        from pyscf_isdf_tpu.scf.kuhf import kuhf_kernel

        return kuhf_kernel(self.system, xc=self.xc, exxdiv=self.exxdiv,
                           conv_tol=self.conv_tol, max_cycle=self.max_cycle,
                           df=self.df, isdf_c=self.isdf_c,
                           isdf_precision=self.isdf_precision,
                           xc_grids=self.xc_grids,
                           verbose=self.verbose)


class KRKSpU(_KMeanField):
    """KRKS with a Hubbard U correction (reference pbc/dft/krkspu.py).

    ``hubbard``: list of (atom_index_or_symbol, l, U_hartree).
    """

    def __init__(self, cell, kpts, xc="lda,vwn", exxdiv="ewald", hubbard=()):
        super().__init__(cell, kpts, xc=xc, exxdiv=exxdiv)
        self.hubbard = list(hubbard)

    def _kernel(self):
        return _khf.kscf_kernel(self.system, xc=self.xc, exxdiv=self.exxdiv,
                                conv_tol=self.conv_tol,
                                max_cycle=self.max_cycle, sigma=self.sigma,
                                smearing_method=self.smearing_method,
                                df=self.df, isdf_c=self.isdf_c,
                                isdf_precision=self.isdf_precision,
                                hubbard=self.hubbard,
                                xc_grids=self.xc_grids,
                                verbose=self.verbose)


class KROHF(_KMeanField):
    def __init__(self, cell, kpts, exxdiv="ewald"):
        super().__init__(cell, kpts, xc=None, exxdiv=exxdiv)

    def _kernel(self):
        from pyscf_isdf_tpu.scf.krohf import krohf_kernel

        return krohf_kernel(self.system, xc=None, exxdiv=self.exxdiv,
                            conv_tol=self.conv_tol,
                            max_cycle=self.max_cycle,
                            df=self.df, isdf_c=self.isdf_c,
                            isdf_precision=self.isdf_precision,
                            verbose=self.verbose)


class KGHF(_KMeanField):
    """k-point generalized (2-component spinor) HF — reference
    pyscf/pbc/scf/kghf.py. ``density_fit('isdf')`` factorizes the
    spinor-block exchange through the same per-q ISDF W as KRHF (the
    contraction is complex-linear in the density, so non-Hermitian
    spin-off-diagonal blocks are served exactly as Hermitian ones)."""

    def __init__(self, cell, kpts, exxdiv="ewald"):
        super().__init__(cell, kpts, xc=None, exxdiv=exxdiv)

    def _kernel(self):
        from pyscf_isdf_tpu.scf.kghf import kghf_kernel

        return kghf_kernel(self.system, exxdiv=self.exxdiv,
                           conv_tol=self.conv_tol,
                           max_cycle=self.max_cycle,
                           df=self.df, isdf_c=self.isdf_c,
                           verbose=self.verbose)


def GW(mf, nw: int = 100, orbs=None, linearized: bool = False,
       fc: bool = False, method: str = "ac"):
    """G0W0 quasiparticle energies on a converged (K)RHF/(K)RKS/
    UHF/UKS object — reference gw.GW(mf) / krgw_ac.KRGWAC(mf) /
    ugw_ac analog.

    ``method``: 'ac' (imaginary-axis + Pade, the frontier-state
    production path) or 'cd' (contour deformation, reference
    gw_cd.py/krgw_cd.py — reliable for DEEP CORE levels; Gamma
    restricted references).

    Returns a GWResult (Gamma), KGWResult (k-point, optional ``fc``
    head/wing finite-size correction) or UGWResult (spin-polarized)
    with .qp_energy."""
    from pyscf_isdf_tpu.gw import (gw_ac_gamma, kgw_ac, kugw_ac,
                                   ugw_ac_gamma)

    if method == "cd":
        if isinstance(mf, (KUHF, KUKS)):
            raise NotImplementedError(
                "k-point spin-polarized GW-CD: use Gamma ugw_cd or "
                "method='ac' (kugw_ac) for now")
        if isinstance(mf, (UHF, UKS)):
            # spin-polarized deep-core path — EXCEEDS the reference,
            # whose CD (pyscf/gw/gw_cd.py) is restricted-only
            from pyscf_isdf_tpu.gw.gw_cd import ugw_cd_gamma

            return ugw_cd_gamma(mf.system, mf._res, xc=mf.xc, nw=nw,
                                orbs=orbs)
        if isinstance(mf, _KMeanField):
            from pyscf_isdf_tpu.gw.gw_cd import kgw_cd

            return kgw_cd(mf.system, mf._res, xc=mf.xc, nw=nw, orbs=orbs)
        from pyscf_isdf_tpu.gw.gw_cd import gw_cd_gamma

        return gw_cd_gamma(mf.system, mf._res, xc=mf.xc, nw=nw,
                           orbs=orbs)
    if method != "ac":
        raise ValueError(f"unknown GW method {method!r}: 'ac' or 'cd'")

    # spin dispatch BEFORE the k-point catch-all: KUHF/KUKS are
    # _KMeanField subclasses and must reach the spin engines
    if isinstance(mf, (KUHF, KUKS)):
        if fc or linearized:
            raise NotImplementedError(
                "kugw_ac supports neither fc nor linearized yet")
        return kugw_ac(mf.system, mf._res, xc=mf.xc, nw=nw, orbs=orbs)
    if isinstance(mf, _KMeanField):
        return kgw_ac(mf.system, mf._res, xc=mf.xc, nw=nw, orbs=orbs,
                      linearized=linearized, fc=fc)
    if isinstance(mf, (UHF, UKS)):
        return ugw_ac_gamma(mf.system, mf._res, xc=mf.xc, nw=nw,
                            orbs=orbs)
    return gw_ac_gamma(mf.system, mf._res, xc=mf.xc, nw=nw, orbs=orbs,
                       linearized=linearized)


def RPA(mf, nw: int = 100):
    """Direct-RPA correlation energy on a converged mean-field
    (reference pyscf/gw/rpa.py capability; the k-point form EXCEEDS it).
    Returns (e_corr, e_tot) — per unit cell for k-point objects."""
    from pyscf_isdf_tpu.gw import rpa_ecorr_gamma, rpa_ecorr_kpts
    from pyscf_isdf_tpu.gw.ugw import kurpa_ecorr, urpa_ecorr_gamma

    if isinstance(mf, (KUHF, KUKS)):
        ec = kurpa_ecorr(mf.system, mf._res, nw=nw)
        return ec, mf._res["e_tot"] + ec
    if isinstance(mf, (UHF, UKS)):
        ec = urpa_ecorr_gamma(mf.system, mf._res, nw=nw)
        return ec, mf._res["e_tot"] + ec
    if isinstance(mf, _KMeanField):
        ec = rpa_ecorr_kpts(mf.system, mf._res, nw=nw)
    else:
        ec = rpa_ecorr_gamma(mf.system, mf._res, nw=nw)
    return ec, mf._res["e_tot"] + ec


def MP2(mf: _MeanField):
    """Gamma-point MP2 on a converged RHF object; returns (e_corr, e_tot)."""
    from pyscf_isdf_tpu.mp import mp2_energy

    e_corr = mp2_energy(mf.system, mf._res)
    return e_corr, mf._res["e_tot"] + e_corr


def KMP2(mf: _KMeanField):
    """k-point MP2 on a converged KRHF object; returns (e_corr, e_tot)."""
    from pyscf_isdf_tpu.mp.kmp2 import kmp2_energy

    e_corr = kmp2_energy(mf.system, mf._res)
    return e_corr, mf._res["e_tot"] + e_corr


def CCSD(mf: _MeanField, with_t: bool = False, conv_tol: float = 1e-9):
    """Gamma-point CCSD (optionally +(T)) on a converged mean-field;
    returns (e_corr, e_tot) — reference cc.CCSD(mf) analog. A UHF/UKS
    reference (tuple mo_coeff) dispatches to spin-unrestricted UCCSD
    (reference cc.UCCSD, pyscf/cc/uccsd.py)."""
    if isinstance(mf._res["mo_coeff"], tuple):
        from pyscf_isdf_tpu.cc.gccsd import uccsd as _ccsd
    else:
        from pyscf_isdf_tpu.cc import ccsd as _ccsd

    out = _ccsd(mf.system, mf._res, with_t=with_t, conv_tol=conv_tol)
    if not out["converged"]:
        raise RuntimeError("CCSD did not converge")
    e_corr = out["e_corr"] + out.get("e_t", 0.0)
    return e_corr, mf._res["e_tot"] + e_corr


def KCCSD(mf: _KMeanField, with_t: bool = False, conv_tol: float = 1e-9,
          tier: str = "auto"):
    """k-point CCSD per unit cell on a converged k-mean-field; returns
    (e_corr, e_tot) — reference pbc.cc.KCCSD(mf) analog.

    tier: 'spatial' (production closed-shell blocked, cc/krccsd.py),
    'blocked' (spin-orbital momentum-blocked), 'composite' (dense
    oracle), or 'auto' — spatial when the reference is closed-shell with
    uniform per-k occupation (and (T) is not requested), else composite.
    A KUHF/KUKS reference (tuple mo_coeff) dispatches to KUCCSD
    (reference pbc.cc.kccsd_uhf) regardless of tier.
    """
    if isinstance(mf._res["mo_coeff"], tuple):
        if with_t:
            # (T) rides the composite dense tier — the same cost class
            # the restricted KCCSD(T) already uses (cc/kccsd.py kuccsd)
            from pyscf_isdf_tpu.cc.kccsd import kuccsd

            out = kuccsd(mf.system, mf._res, with_t=True,
                         conv_tol=conv_tol)
            if not out["converged"]:
                raise RuntimeError("KUCCSD did not converge")
            return (out["e_corr"] + out["e_t"],
                    mf._res["e_tot"] + out["e_corr"] + out["e_t"])
        from pyscf_isdf_tpu.cc.kccsd_blocked import kuccsd_blocked

        out = kuccsd_blocked(mf.system, mf._res, conv_tol=conv_tol)
        if not out["converged"]:
            raise RuntimeError("KUCCSD did not converge")
        return out["e_corr"], mf._res["e_tot"] + out["e_corr"]
    if tier == "auto":
        import numpy as _np

        occ = _np.asarray(mf._res.get("mo_occ"))
        uniform = (occ is not None and occ.ndim == 2
                   and bool(_np.all((occ > 0.5).sum(1)
                                    == (occ > 0.5).sum(1)[0])))
        tier = "spatial" if (uniform and not with_t) else "composite"
    if tier == "spatial":
        from pyscf_isdf_tpu.cc.krccsd import krccsd as _kern

        out = _kern(mf.system, mf._res, conv_tol=conv_tol)
    elif tier == "blocked":
        from pyscf_isdf_tpu.cc.kccsd_blocked import kccsd_blocked as _kern

        out = _kern(mf.system, mf._res, conv_tol=conv_tol)
    else:
        from pyscf_isdf_tpu.cc.kccsd import kccsd as _kccsd

        out = _kccsd(mf.system, mf._res, with_t=with_t, conv_tol=conv_tol)
    if not out["converged"]:
        raise RuntimeError("KCCSD did not converge")
    e_corr = out["e_corr"] + out.get("e_t", 0.0)
    return e_corr, mf._res["e_tot"] + e_corr


def EOMCCSD(mf: _MeanField, sector: str = "ee", nroots: int = 6,
            conv_tol: float = 1e-10):
    """EOM-CCSD excitation energies / IPs / EAs (sector 'ee'|'ip'|'ea')
    on a converged Gamma mean-field — reference eom_kccsd analog.
    Small-system determinant-space path (see cc/eom.py). Run the mean
    field with exxdiv=None so the amplitude and determinant Hamiltonians
    share one partition (the ewald probe shift moves occupied levels)."""
    from pyscf_isdf_tpu.cc import ccsd as _ccsd
    from pyscf_isdf_tpu.cc.eom import eom_from_scf

    out = _ccsd(mf.system, mf._res, conv_tol=conv_tol)
    if not out["converged"]:
        raise RuntimeError("CCSD did not converge")
    return eom_from_scf(mf.system, mf._res, out, sector=sector,
                        nroots=nroots)


def KEOMCCSD(mf: _KMeanField, sector: str = "ee", nroots: int = 4,
             conv_tol: float = 1e-10, target=None,
             return_weights: bool = False):
    """Production-cost EOM-KCCSD on a converged k-point mean field
    (reference pbc/cc/eom_kccsd_rhf.py EOMIP/EOMEA/EOMEE classes).

    Solves the supercell problem on the composite momentum-blocked
    spin-orbital integrals (cc/kccsd.py): EE through the CCSD-residual
    Jacobian jvp, IP/EA through its continuum-orbital subblock
    (cc/eom.py) — polynomial cost, no determinant space. Returned
    values are intensive energy DIFFERENCES (excitation energies /
    E(N∓1)-E(N)), so the supercell-vs-per-cell normalization drops
    out. ``target`` enables shift-invert targeting of interior roots
    (ip/ea sectors). Run the mean field with exxdiv=None so amplitude
    and sigma Hamiltonians share one partition.
    """
    from pyscf_isdf_tpu.cc.kccsd import build_composite_eris, kccsd
    from pyscf_isdf_tpu.cc.eom import (eom_ee_energies,
                                       eom_ip_ea_energies)

    out = kccsd(mf.system, mf._res, conv_tol=conv_tol)
    if not out["converged"]:
        raise RuntimeError("KCCSD did not converge")
    f_so, eri_so, no_so = build_composite_eris(mf.system, mf._res)
    t1 = np.asarray(out["t1"])
    t2 = np.asarray(out["t2"])
    if sector == "ee":
        return eom_ee_energies(f_so, eri_so, t1, t2, no_so,
                               nroots=nroots)
    if sector not in ("ip", "ea"):
        raise ValueError(f"sector {sector!r}: one of 'ee'|'ip'|'ea'")
    # return_weights=True: (energies, pole strengths, orbital-resolved
    # 1h/1p amplitudes on the composite (k, orbital) index) — the
    # k-resolved photoemission output (quasiparticle weights; the
    # reference's kadc_rhf_ip spectroscopic-factor role)
    return eom_ip_ea_energies(f_so, eri_so, t1, t2, no_so,
                              sector=sector, nroots=nroots,
                              target=target,
                              return_weights=return_weights)


def KMP2_stagger(mf: _KMeanField, flag_submesh: bool = False):
    """Staggered-mesh k-point MP2 (reference pyscf/pbc/mp/kmp2_stagger.py)
    on a converged KRHF object; returns (e_corr, e_tot)."""
    from pyscf_isdf_tpu.mp.kmp2_stagger import kmp2_stagger_energy

    e_corr = kmp2_stagger_energy(mf.system, mf._res,
                                 flag_submesh=flag_submesh, xc=mf.xc)
    return e_corr, mf._res["e_tot"] + e_corr


def _isdfk_for_exchange(mf):
    """k-ISDF factors for exact-exchange response, when the ground state
    has exchange (HF, or a hybrid functional)."""
    from pyscf_isdf_tpu.ops.xc import XCSpec

    hyb = 1.0 if mf.xc is None else XCSpec(mf.xc).hyb
    if hyb <= 0:
        return None
    from pyscf_isdf_tpu.df import isdf_k

    return isdf_k.build_isdf_k(mf.cell, mf.system.aoR_k, mf.system.kpts,
                               c=mf.isdf_c)


def _dedup_realified(e, tol=1e-7):
    """Collapse realification partners: each group of roots equal within
    ``tol`` came from pairs (one complex root -> two real roots), so a
    group of size g holds ceil(g/2) physical states (odd g = a pair cut
    by the nstates truncation)."""
    e = np.sort(np.asarray(e))
    out = []
    i = 0
    while i < len(e):
        j = i + 1
        while j < len(e) and e[j] - e[i] <= tol * max(1.0, abs(e[i])):
            j += 1
        g = j - i
        out.extend(e[i:i + (g + 1) // 2])
        i = j
    return np.asarray(out)


def TDA(mf, nstates=5, singlet=True):
    """Excitation energies: dense TDA for Gamma mean-fields, Davidson
    k-TDA (ISDF exchange response) for k-point mean-fields — the
    reference's mf.TDA() analog. Returns energies in Hartree."""
    if isinstance(mf, _KMeanField):
        from pyscf_isdf_tpu.tdscf.ktda import ktda_davidson

        e, _ = ktda_davidson(mf.system, mf._res, xc=mf.xc,
                             nstates=2 * nstates, singlet=singlet,
                             isdfk=_isdfk_for_exchange(mf))
        # The realified Davidson returns every root twice (complex
        # eigenpair -> real 2x2 block); halve each near-degenerate
        # group's multiplicity instead of collapsing it to one, so
        # genuine physical degeneracies keep their multiplicity.
        return _dedup_realified(np.asarray(e))[:nstates]
    from pyscf_isdf_tpu.tdscf import tda_kernel

    e, _ = tda_kernel(mf.system, mf._res, xc=mf.xc, nstates=nstates,
                      singlet=singlet)
    return np.asarray(e)


def TDDFT(mf, nstates=5, singlet=True):
    """Full linear-response (Casida/RPA) excitation energies; dense at
    Gamma, paired-response solver at k (reference mf.TDDFT() analog)."""
    if isinstance(mf, _KMeanField):
        from pyscf_isdf_tpu.tdscf.ktda import ktddft_kernel

        return np.asarray(ktddft_kernel(mf.system, mf._res, xc=mf.xc,
                                        nstates=nstates, singlet=singlet,
                                        isdfk=_isdfk_for_exchange(mf)))
    from pyscf_isdf_tpu.tdscf import tddft_kernel

    return np.asarray(tddft_kernel(mf.system, mf._res, xc=mf.xc,
                                   nstates=nstates, singlet=singlet))


def Gradients(mf: _MeanField):
    """Nuclear gradients dE/dR (natm, 3) of a converged mean-field by
    autodiff (grad/) — reference mf.nuc_grad_method() analog. Dispatches
    restricted/unrestricted and Gamma/k-point."""
    if isinstance(mf, (UHF, UKS)):
        from pyscf_isdf_tpu.grad.uhf import uhf_gradient

        return uhf_gradient(mf.system, mf._res, xc=mf.xc, exxdiv=mf.exxdiv)
    if isinstance(mf, ROHF):
        from pyscf_isdf_tpu.grad.uhf import rohf_gradient

        return rohf_gradient(mf.system, mf._res, xc=mf.xc,
                             exxdiv=mf.exxdiv)
    if isinstance(mf, (KUHF, KUKS)):
        from pyscf_isdf_tpu.grad.kuhf import kuhf_gradient

        return kuhf_gradient(mf.system, mf._res, xc=mf.xc, exxdiv=mf.exxdiv)
    if isinstance(mf, (KRHF, KRKS)):
        from pyscf_isdf_tpu.grad.khf import krhf_gradient

        return krhf_gradient(mf.system, mf._res, xc=mf.xc, exxdiv=mf.exxdiv)
    if isinstance(mf, _KMeanField):
        raise NotImplementedError("gradients: only KRHF/KRKS/KUHF/KUKS at k")
    from pyscf_isdf_tpu.grad import rhf_gradient

    return rhf_gradient(mf.system, mf._res, xc=mf.xc, exxdiv=mf.exxdiv)


def Stress(mf: _MeanField):
    """Stress tensor sigma = (1/vol) dE/d eps (3x3, Ha/Bohr^3) by strain
    autodiff — no counterpart exists in the reference. Dispatches
    Gamma (grad/stress.py) and k-point (grad/kstress.py)."""
    if isinstance(mf, (KRHF, KRKS)):
        from pyscf_isdf_tpu.grad.kstress import kstress_tensor

        return kstress_tensor(mf.system, mf._res, xc=mf.xc,
                              exxdiv=mf.exxdiv)
    if isinstance(mf, _KMeanField):
        raise NotImplementedError("stress: only KRHF/KRKS at k")
    if isinstance(mf, ROHF):
        from pyscf_isdf_tpu.grad.stress import rostress_tensor

        return rostress_tensor(mf.system, mf._res, xc=mf.xc,
                               exxdiv=mf.exxdiv)
    if isinstance(mf, (UHF, UKS)):
        from pyscf_isdf_tpu.grad.stress import ustress_tensor

        return ustress_tensor(mf.system, mf._res, xc=mf.xc,
                              exxdiv=mf.exxdiv)
    from pyscf_isdf_tpu.grad.stress import stress_tensor

    return stress_tensor(mf.system, mf._res, xc=mf.xc, exxdiv=mf.exxdiv)
