"""Geometry optimization on autodiff forces (FIRE integrator).

The reference delegates geometry optimization to external drivers
(geometric/berny via pyscf/geomopt) feeding analytic gradients. Here
the forces come from grad/rhf.py autodiff; the optimizer is FIRE
(Bitzek et al., PRL 97, 170201 (2006)) — robust, parameter-light, and
needs only (E, F) evaluations.
"""
from __future__ import annotations

import numpy as np


def optimize(cell0, xc=None, exxdiv="ewald", maxsteps=50, fmax=2e-3,
             dt0=0.35, verbose=False):
    """Relax atom positions at fixed lattice. Returns (cell, info dict).

    fmax: convergence threshold on max |force component| (Ha/Bohr).
    Grid egg-box noise bounds the useful fmax from below (~1e-4 on
    typical meshes); choose fmax above it.
    """
    from dataclasses import replace

    from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
    from pyscf_isdf_tpu.grad.rhf import rhf_gradient

    def rebuild(positions):
        # shells reference atoms by index, so moving a frozen Cell is just
        # swapping its coordinate table
        return replace(cell0, coords=np.asarray(positions, dtype=float))

    pos = np.array(cell0.coords, dtype=float)
    vel = np.zeros_like(pos)
    dt, a_fire = dt0, 0.1
    n_up = 0
    traj = []
    dm0 = None
    for step in range(maxsteps):
        cell = rebuild(pos)
        system = build_scf_system(cell)
        res = scf_kernel(system, xc=xc, exxdiv=exxdiv, conv_tol=1e-10,
                         dm0=dm0)
        dm0 = res["dm"]
        force = -rhf_gradient(system, res, xc=xc, exxdiv=exxdiv)
        fnorm = np.abs(force).max()
        traj.append((res["e_tot"], fnorm))
        if verbose:
            print(f"opt step {step:3d}  E = {res['e_tot']:.10f}  "
                  f"max|F| = {fnorm:.2e}  dt = {dt:.3f}")
        if fnorm < fmax:
            return cell, {"converged": True, "e_tot": res["e_tot"],
                          "nsteps": step + 1, "traj": traj,
                          "positions": pos}
        # FIRE update
        p = float(np.vdot(force, vel))
        if p > 0:
            n_up += 1
            vhat = vel / (np.linalg.norm(vel) + 1e-300)
            fhat = force / (np.linalg.norm(force) + 1e-300)
            vel = (1 - a_fire) * vel \
                + a_fire * np.linalg.norm(vel) * fhat
            if n_up > 5:
                dt = min(dt * 1.1, 4 * dt0)
                a_fire *= 0.99
        else:
            vel[:] = 0.0
            dt *= 0.5
            a_fire = 0.1
            n_up = 0
        vel = vel + dt * force
        dr = dt * vel
        steplen = np.abs(dr).max()
        if steplen > 0.2:                      # trust radius (Bohr)
            dr *= 0.2 / steplen
        pos = pos + dr
    cell = rebuild(pos)
    return cell, {"converged": False, "e_tot": traj[-1][0],
                  "nsteps": maxsteps, "traj": traj, "positions": pos}
