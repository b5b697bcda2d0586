"""Constrained DFT: external-potential shifts and charge constraints.

Reference: pyscf/pbc/dft/cdft.py (orbital-shift cDFT — ships deprecated
and self-described as incomplete: it adds ``shift_hamiltonian`` to veff
while keeping ecoul/exc, cdft.py:64-71, so the reported energy is the
plain functional of the constrained density) and the charge-constraint
method it points to (examples/1-advanced/033-constrained_dft.py: a
Lagrange multiplier on a fragment population, optimized so the
constraint is met at SCF convergence).

TPU-native formulation: the SCF kernel takes an arbitrary one-body
``v_ext`` (scf/hf.py) added to the Fock but excluded from the energy;
this module builds the two standard constraint potentials on top:

  * :func:`orbital_shift` — shift a chosen orbital (in any working
    basis) by a constant: V = offset * S c c^H S / (c^H S c), the
    AO-basis projector form of the reference's diagonal-shift contract.
  * :func:`lowdin_population_op` + :func:`cdft_kernel` — constrain the
    Löwdin population of a set of AOs to a target by optimizing the
    multiplier of V = lam * P with a secant iteration, warm-starting
    each inner SCF from the previous density.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pyscf_isdf_tpu.scf.hf import scf_kernel


def orbital_shift(S: np.ndarray, coeff: np.ndarray, offset: float
                  ) -> np.ndarray:
    """Projector potential shifting one orbital by ``offset`` Hartree.

    Args:
        S: (nao, nao) overlap.
        coeff: (nao,) orbital coefficients in the AO basis (any
            normalization; the projector normalizes by c^H S c).
    """
    c = np.asarray(coeff, dtype=np.float64).reshape(-1)
    Sc = S @ c
    return offset * np.outer(Sc, Sc) / float(c @ Sc)


def lowdin_population_op(S: np.ndarray, ao_indices: Sequence[int]
                         ) -> np.ndarray:
    """Löwdin population operator P for a fragment: N = tr(P D) with
    P = S^1/2 diag(w) S^1/2, w selecting the fragment AOs."""
    w, v = np.linalg.eigh(S)
    s_half = (v * np.sqrt(np.maximum(w, 0.0))) @ v.T
    sel = np.zeros(S.shape[0])
    sel[np.asarray(ao_indices, dtype=int)] = 1.0
    return s_half @ np.diag(sel) @ s_half


def cdft_kernel(
    system,
    xc: Optional[str],
    ao_indices: Sequence[int],
    target: float,
    lam0: float = 0.0,
    lam1: float = 0.5,
    tol: float = 1e-6,
    max_outer: int = 30,
    **scf_kwargs,
):
    """Charge-constrained SCF: find lam so the Löwdin population of
    ``ao_indices`` equals ``target`` at convergence of
    scf_kernel(..., v_ext=lam * P).

    Returns the converged scf result dict extended with
    ``lam`` (the multiplier), ``population`` and ``constraint_op``.
    """
    P = lowdin_population_op(system.S, ao_indices)

    dm0 = scf_kwargs.pop("dm0", None)
    state = {"dm": dm0}

    def population(lam):
        res = scf_kernel(system, xc=xc, v_ext=lam * P, dm0=state["dm"],
                         **scf_kwargs)
        state["dm"] = res["dm"]
        state["res"] = res
        return float(np.einsum("ij,ji->", P, res["dm"]))

    # secant iteration on the multiplier (population decreases with lam)
    n0 = population(lam0)
    if abs(n0 - target) < tol:
        lam1, n1 = lam0, n0
    else:
        n1 = population(lam1)
    it = 0
    while abs(n1 - target) > tol and it < max_outer:
        if abs(n1 - n0) < 1e-14:
            raise RuntimeError("cdft: population insensitive to the "
                               "multiplier (constraint unreachable)")
        lam0, lam1 = lam1, lam1 + (target - n1) * (lam1 - lam0) / (n1 - n0)
        n0 = n1
        n1 = population(lam1)
        it += 1
    if abs(n1 - target) > tol:
        raise RuntimeError(
            f"cdft: constraint not met after {max_outer} outer iterations "
            f"(population {n1:.6f}, target {target:.6f})")
    res = dict(state["res"])
    res["lam"] = float(lam1)
    res["population"] = float(n1)
    res["constraint_op"] = P
    return res
