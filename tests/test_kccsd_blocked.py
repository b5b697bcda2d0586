"""Production-scaling KCCSD: blocked kernels vs the composite oracle.

VERDICT r2 next #2 done-bars: the momentum-blocked kernels must match
the dense composite-index KCCSD (cc/kccsd.py) at 3x1x1 szv to 1e-9;
the spatial-orbital tier holds the memory story (the composite path is
O((nk nso)^4) — diamond 2x2x2 dzvp would need ~500 TB; measured blocked
peak RSS for that system is ~15 GB on the build box).

All three paths share one Hamiltonian: the bra/ket-swap-symmetrized
grid ERIs (<pq|rs> = <qp|sr> exactly — the raw transform breaks it at
the aliasing level, which would otherwise split the spin-adapted and
spin-orbital fixed points at ~1e-9).
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell, lattice
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
from pyscf_isdf_tpu.cc.kccsd import kccsd
from pyscf_isdf_tpu.cc.kccsd_blocked import kccsd_blocked
from pyscf_isdf_tpu.cc.krccsd import krccsd


@pytest.fixture(scope="module")
def h2_311():
    L = 6.0
    cell = build_cell(np.array([[2.8, 0, 0], [0, L, 0], [0, 0, L]]),
                      [["H", (0.0, L / 2, L / 2)],
                       ["H", (1.3, L / 2, L / 2)]],
                      basis="gth-szv", pseudo="gth-pade", mesh=[8, 16, 16])
    kpts = lattice.make_kpts(cell.a, [3, 1, 1])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    return ksys, kres


def test_blocked_matches_composite(h2_311):
    """Spin-orbital blocked == composite at complex 3x1x1 (to 1e-9)."""
    ksys, kres = h2_311
    ref = kccsd(ksys, kres, conv_tol=1e-10)
    blk = kccsd_blocked(ksys, kres, conv_tol=1e-10)
    assert blk["converged"]
    assert abs(blk["e_corr"] - ref["e_corr"]) < 1e-9


def test_krccsd_matches_composite(h2_311):
    """Spatial-orbital (spin-enumerated) == composite at 3x1x1."""
    ksys, kres = h2_311
    ref = kccsd(ksys, kres, conv_tol=1e-10)
    r = krccsd(ksys, kres, conv_tol=1e-10)
    assert r["converged"]
    assert abs(r["e_corr"] - ref["e_corr"]) < 1e-9


def test_kein_engine_vs_dense():
    """The k-blocked einsum engine against a dense composite einsum for
    a random momentum-conserving tensor (engine-level oracle)."""
    import jax.numpy as jnp
    from pyscf_isdf_tpu.cc.kccsd_blocked import (KAlgebra, kein,
                                                 _perm_last2)

    a = np.eye(3)
    kpts = lattice.make_kpts(a, [3, 1, 1])
    ka = KAlgebra(a, kpts)
    nk, d = ka.nk, 2
    rng = np.random.default_rng(0)

    def rand_blocked():
        return (rng.standard_normal((nk, nk, nk, d, d, d, d))
                + 1j * rng.standard_normal((nk, nk, nk, d, d, d, d)))

    def densify(T):
        n = nk * d
        dense = np.zeros((n, n, n, n), dtype=complex)
        for k1 in range(nk):
            for k2 in range(nk):
                for k3 in range(nk):
                    k4 = int(ka.k4(k1, k2, k3))
                    dense[k1 * d:(k1 + 1) * d, k2 * d:(k2 + 1) * d,
                          k3 * d:(k3 + 1) * d, k4 * d:(k4 + 1) * d] \
                        = T[k1, k2, k3]
        return dense

    T, S = rand_blocked(), rand_blocked()
    dT, dS = densify(T), densify(S)
    for spec, dense_ref in [
        ("mnef,ijef->mnij", np.einsum("mnef,ijef->mnij", dT, dS)),
        ("imae,mbej->ijab", np.einsum("imae,mbej->ijab", dT, dS)),
    ]:
        out = np.asarray(kein(spec, jnp.asarray(T), jnp.asarray(S), ka))
        err = 0.0
        for k1 in range(nk):
            for k2 in range(nk):
                for k3 in range(nk):
                    k4 = int(ka.k4(k1, k2, k3))
                    blk = dense_ref[k1 * d:(k1 + 1) * d,
                                    k2 * d:(k2 + 1) * d,
                                    k3 * d:(k3 + 1) * d,
                                    k4 * d:(k4 + 1) * d]
                    err = max(err, np.abs(blk - out[k1, k2, k3]).max())
        assert err < 1e-12, spec
    # blocked P(ab) == dense transpose(0,1,3,2)
    P = np.asarray(_perm_last2(jnp.asarray(T), ka))
    dP = densify(P)
    assert np.abs(dP - dT.transpose(0, 1, 3, 2)).max() < 1e-14


@pytest.mark.slow
def test_blocked_diamond_221():
    """p shells + nontrivial wrap-around momenta: spin-orbital blocked,
    spatial blocked and composite all agree on diamond 2x2x1."""
    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 2, 1])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    ref = kccsd(ksys, kres, conv_tol=1e-9)
    blk = kccsd_blocked(ksys, kres, conv_tol=1e-9)
    r = krccsd(ksys, kres, conv_tol=1e-9)
    assert blk["converged"] and r["converged"]
    assert abs(blk["e_corr"] - ref["e_corr"]) < 1e-9
    assert abs(r["e_corr"] - ref["e_corr"]) < 1e-9


@pytest.mark.slow
def test_krccsd_diamond_222():
    """Full 2x2x2 mesh (every q channel) with the spatial kernel — the
    scale the composite path cannot reach at real basis sets; here szv
    so the spin-orbital blocked kernel can cross-check it."""
    cell = diamond_primitive(mesh=(12, 12, 12))
    kpts = lattice.make_kpts(cell.a, [2, 2, 2])
    ksys = build_kscf_system(cell, kpts)
    kres = kscf_kernel(ksys, xc=None, exxdiv="ewald", conv_tol=1e-11)
    blk = kccsd_blocked(ksys, kres, conv_tol=1e-9)
    r = krccsd(ksys, kres, conv_tol=1e-9)
    assert blk["converged"] and r["converged"]
    assert abs(r["e_corr"] - blk["e_corr"]) < 1e-9
