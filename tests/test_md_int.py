"""McMurchie-Davidson analytic Coulomb integrals (ops/md_int.py) — the
host-side engine of the all-electron GDF (VERDICT r2 next #5).

Anchors:
  * lattice-summed overlap == the closed-form S of ops/ft_ao (independent
    derivation: Hermite E-coefficients vs Fourier/Hermite-polynomial path);
  * molecular RHF total energies from int2e_molecular + vne against
    published STO-3G values (He, H2, water — water exercises p shells
    through every E/R/solid-harmonic branch);
  * int2c s-type closed form (P|Q) = 2 pi^2.5/(ab sqrt(a+b)) F0(rho R^2);
  * int3c == int2e under the half-exponent trick (an s aux Gaussian with
    exponent c is the self-product of an s AO with exponent c/2);
  * erfc kernel limits: SR(omega->inf) -> full 1/r, SR(omega->0) -> 0,
    and the positive diagonal sandwich 0 <= (P|erfc|P) <= (P|1/r|P).

Reference counterpart: pyscf's libcint Rys-polynomial integrals driving
pyscf/pbc/df/rsdf_builder.py:59 + lib/pbc/fill_ints.c:528.
"""
import numpy as np
import scipy.linalg as sla

from pyscf_isdf_tpu.cell import build_cell
from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.ops import ft_ao, md_int


def _molecule(atom, basis):
    """0-dimension 'cell': huge box — md_int's molecular paths see a
    single lattice image."""
    return build_cell(np.eye(3) * 200.0, atom, basis, mesh=(4, 4, 4),
                      dimension=0)


def _rhf(S, h, eri, nelec, cycles=80):
    """Minimal dense RHF loop (test-local oracle driver)."""
    nocc = nelec // 2
    e_old, dm = 0.0, np.zeros_like(S)
    f = h.copy()
    for _ in range(cycles):
        _, c = sla.eigh(f, S)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        vj = np.einsum("ijkl,lk->ij", eri, dm)
        vk = np.einsum("ikjl,lk->ij", eri, dm)
        f = h + vj - 0.5 * vk
        e = 0.5 * np.einsum("ij,ji->", dm, h + f)
        if abs(e - e_old) < 1e-12:
            break
        e_old = e
    return e


def _e_nuc(Z, R):
    e = 0.0
    for i in range(len(Z)):
        for j in range(i):
            e += Z[i] * Z[j] / np.linalg.norm(R[i] - R[j])
    return e


def test_overlap_matches_ft_ao():
    cell = diamond_primitive(mesh=(8, 8, 8))
    S_md = md_int.overlap(cell)
    S_ref, _ = ft_ao.overlap_and_kinetic_analytic(cell)
    # 1e-11: the two derivations sum lattice images in different orders
    assert np.abs(S_md - np.asarray(S_ref).real).max() < 1e-11


def test_he_rhf_sto3g():
    """Published anchor: He/STO-3G RHF = -2.807783957539976 Ha."""
    mol = _molecule([["He", (0.0, 0.0, 0.0)]], "sto-3g")
    S = md_int.overlap(mol)
    _, T = ft_ao.overlap_and_kinetic_analytic(mol)
    V = md_int.vne(mol, omega=None)
    eri = md_int.int2e_molecular(mol)
    e = _rhf(S, np.asarray(T).real + V, eri, 2)
    assert abs(e - (-2.807783957539976)) < 1e-8


def test_h2_rhf_sto3g():
    """Szabo-Ostlund: H2/STO-3G at R = 1.4 a0, E = -1.116714 Ha."""
    R = np.array([[0, 0, 0], [0, 0, 1.4]], float)
    mol = _molecule([["H", tuple(R[0])], ["H", tuple(R[1])]], "sto-3g")
    S = md_int.overlap(mol)
    _, T = ft_ao.overlap_and_kinetic_analytic(mol)
    V = md_int.vne(mol, omega=None)
    eri = md_int.int2e_molecular(mol)
    e = _rhf(S, np.asarray(T).real + V, eri, 2) + _e_nuc([1, 1], R)
    assert abs(e - (-1.116714)) < 2e-6


def test_water_rhf_sto3g():
    """Crawford test-case geometry (bohr), E(RHF/STO-3G) =
    -74.942079928192 Ha — exercises p shells through E/R/sph."""
    R = np.array([[0.0, 0.0, -0.143225816552],
                  [0.0, 1.638036840407, 1.136548822547],
                  [0.0, -1.638036840407, 1.136548822547]])
    mol = _molecule([["O", tuple(R[0])], ["H", tuple(R[1])],
                     ["H", tuple(R[2])]], "sto-3g")
    S = md_int.overlap(mol)
    _, T = ft_ao.overlap_and_kinetic_analytic(mol)
    V = md_int.vne(mol, omega=None)
    eri = md_int.int2e_molecular(mol)
    e = _rhf(S, np.asarray(T).real + V, eri, 10) + _e_nuc([8, 1, 1], R)
    assert abs(e - (-74.942079928192)) < 1e-7


def test_int2c_s_closed_form():
    rng = np.random.default_rng(7)
    a, b = 1.3, 0.42
    Rq = rng.normal(size=3)
    cellPQ = _molecule([["H", (0.0, 0.0, 0.0)], ["H", tuple(Rq)]],
                       {"H": [[0, (a, 1.0)], [0, (b, 1.0)]]})
    J = md_int.int2c(cellPQ, omega=None)
    Na, Nb = (2 * a / np.pi) ** 0.75, (2 * b / np.pi) ** 0.75
    rho = a * b / (a + b)
    F0 = md_int.boys(0, np.array([rho * float(Rq @ Rq)]))[0, 0]
    ref_ab = Na * Nb * 2 * np.pi ** 2.5 / (a * b * np.sqrt(a + b)) * F0
    # AO order per atom: (a-shell, b-shell); entry (0, 3) = (a@0 | b@Rq)
    assert abs(J[0, 3] - ref_ab) < 1e-12 * max(1.0, abs(ref_ab))


def test_int3c_half_exponent_vs_int2e():
    """(mu nu | P), P an s aux Gaussian(c) == (mu nu | p p) * Nc/Np^2
    with p an s AO Gaussian(c/2) (its self-product is a Gaussian(c))."""
    rng = np.random.default_rng(11)
    Rs = rng.normal(size=(2, 3))
    Rc = rng.normal(size=3)
    c = 0.9
    basis = {"H": [[0, (1.1, 1.0)], [1, (0.7, 1.0)]]}
    mol = _molecule([["H", tuple(Rs[0])], ["H", tuple(Rs[1])]], basis)
    aux = _molecule([["He", tuple(Rc)]], {"He": [[0, (c, 1.0)]]})
    j3c = md_int.int3c(mol, aux, omega=None)   # (1, nao, nao)

    # widened molecule: same AOs plus the half-exponent s ket function
    # on a distinct element so the basis dict stays per-symbol
    mol2 = _molecule([["H", tuple(Rs[0])], ["H", tuple(Rs[1])],
                      ["He", tuple(Rc)]],
                     {"H": basis["H"], "He": [[0, (c / 2, 1.0)]]})
    eri = md_int.int2e_molecular(mol2)
    nao = mol.nao
    Np = (2 * (c / 2) / np.pi) ** 0.75          # AO normalization of p
    Nc = (2 * c / np.pi) ** 0.75                # aux normalization
    ref = eri[:nao, :nao, nao, nao] * Nc / Np ** 2
    assert np.abs(j3c[0] - ref).max() < 1e-11


def test_sr_kernel_limits_int2c():
    """erfc(w r)/r -> 1/r as w -> 0; the SR weight decreases
    monotonically in w and is sandwiched by 0 and the full kernel."""
    rng = np.random.default_rng(3)
    Rq = rng.normal(size=3) * 2.0
    basis = {"H": [[0, (0.8, 1.0)], [1, (1.4, 1.0)]]}
    aux = _molecule([["H", (0.0, 0.0, 0.0)], ["H", tuple(Rq)]], basis)
    full = md_int.int2c(aux, omega=None)
    # small-w limit: (P|erf(w r)/r|Q) = (2 w/sqrt(pi)) q_P q_Q + O(w^3)
    # (w must stay >> 1/box so no lattice image enters the erfc range)
    # residual after the O(w) term is the O(w^3) second-moment term
    # ~ (2 w^3/(3 sqrt(pi))) q^2 <|r1-r2|^2> ~ 3e-3 here at w=0.02
    w0 = 0.02
    sr_tiny = md_int.int2c(aux, omega=w0)
    q = np.real(ft_ao.ft_ao(aux, np.zeros((1, 3)))[0])
    corr = 2.0 * w0 / np.sqrt(np.pi) * np.outer(q, q)
    assert np.abs(full - sr_tiny - corr).max() < 5e-3
    d_mid = np.diag(md_int.int2c(aux, omega=0.6))
    d_big = np.diag(md_int.int2c(aux, omega=50.0))
    d_full = np.diag(full)
    assert np.all(d_big > -1e-14)
    assert np.all(d_big < d_mid) and np.all(d_mid < d_full)
