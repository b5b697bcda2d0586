"""BENCH_r03 accuracy certification, the translation-symmetric way
(VERDICT r2 next #1).

Converges the PRIMITIVE-cell k-point LDA density in float64 on CPU
(nao=8, 16^3 grid, nk k-points — minutes, where the equivalent
supercell f64 SCF is hours), builds the translation-symmetric supercell
ISDF per momentum transfer q (df/isdf_sym.py — nk^2 fewer flops than
the dense supercell solve, so float64 is feasible at the diamond 3x3x3
bench scale), and evaluates the EXACT robust-fit exchange deficit

    tr(D (K_exact - K_robust)) = (w/nk) sum_pairs (r, V_q r) >= 0

at the converged density for a ladder of compressions c. The supercell/
k-point duality makes this numerically identical to the supercell
FFTDF-vs-robust-ISDF |dE| that BENCH_NOTES' f64 table reports (pinned
by tests/test_isdf_sym.py to 1%).

With --save, stores the per-q factorization pieces of the chosen c so
bench.py can assemble the SAME factorization on the TPU (f32-cast) —
speed and certified f64 method accuracy of ONE configuration.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python tools/certify_sym.py --nrep 3,3,3 --pm 16 \
          --c 12,16,20,24 --save 20

Reference cost model being beaten: pyscf/pbc/df/fft_jk.py:276-291.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrep", default="3,3,3")
    ap.add_argument("--pm", type=int, default=16,
                    help="primitive-cell mesh per axis")
    ap.add_argument("--c", default="12,16,20,24")
    ap.add_argument("--basis", default="gth-szv")
    ap.add_argument("--save", type=float, default=None,
                    help="save the factorization at this c for bench.py")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    nrep = tuple(int(x) for x in args.nrep.split(","))
    cs = [float(x) for x in args.c.split(",")]

    from pyscf_isdf_tpu import lattice
    from pyscf_isdf_tpu.models import diamond_primitive, diamond_supercell
    from pyscf_isdf_tpu.ops import coulomb
    from pyscf_isdf_tpu.scf.khf import build_kscf_system, kscf_kernel
    from pyscf_isdf_tpu.df import isdf_sym

    pm = (args.pm,) * 3
    prim = diamond_primitive(mesh=pm, basis=args.basis)
    sc = diamond_supercell(nrep=nrep, basis=args.basis,
                           mesh=tuple(n * m for n, m in zip(nrep, pm)))
    kpts = lattice.make_kpts(prim.a, list(nrep), with_gamma_point=True)
    nk = len(kpts)
    print(f"prim nao={prim.nao} mesh={pm} nk={nk} "
          f"(supercell nao={prim.nao * nk}, mesh={sc.mesh})", flush=True)

    t0 = time.time()
    ksys = build_kscf_system(prim, kpts)
    res = kscf_kernel(ksys, xc="lda,vwn", conv_tol=1e-10)
    assert res["converged"]
    print(f"KLDA f64 SCF: {time.time()-t0:.0f} s  "
          f"E/cell = {res['e_tot']:.9f}", flush=True)

    # sqrt(occupation)-scaled occupied Bloch orbitals on the grid
    occ = np.asarray(res["mo_occ"])                     # (nk, nao)
    nocc = int(round(occ.sum() / (2 * nk)))
    assert np.allclose(occ[:, :nocc], 2.0) and occ[:, nocc:].max() < 1e-9, \
        "insulating uniform occupation expected"
    C_w = np.asarray(res["mo_coeff"])[:, :, :nocc] * np.sqrt(2.0)
    psi_k = jnp.einsum("kgi,kij->kgj", ksys.aoR_k,
                       jnp.asarray(C_w, ksys.aoR_k.dtype))

    coulG_super = np.asarray(coulomb.get_coulG(sc))
    rows = []
    for c in cs:
        t0 = time.time()
        sym = isdf_sym.build_sym(prim, nrep, ksys.aoR_k, kpts,
                                 coulG_super, c=c)
        de = isdf_sym.certify_deficit(sym, psi_k)
        nip = len(np.asarray(sym.isdfq.ip_idx))
        print(f"c={c:5.1f}  n_ip={nip * nk:5d}  "
              f"|dE| = {de:.3e} Ha  [{time.time()-t0:.0f} s]", flush=True)
        rows.append((c, nip * nk, de))
        if args.save is not None and abs(c - args.save) < 1e-9:
            btag = "" if args.basis == "gth-szv" else \
                "_" + args.basis.replace("gth-", "")
            out = args.out or os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                f"symfac_{''.join(map(str, nrep))}{btag}.npz")
            np.savez_compressed(
                out,
                q_list=sym.q_list, kpts=sym.kpts,
                nrep=np.asarray(sym.nrep),
                prim_mesh=np.asarray(sym.prim_mesh),
                prim_a=np.asarray(prim.a),
                ip_idx=np.asarray(sym.isdfq.ip_idx),
                Mq=np.asarray(sym.Mq).astype(np.complex128),
                VXq=np.asarray(sym.isdfq.VXq).astype(np.complex64),
                weight=sym.weight, dE_f64_ha=de,
                e_tot_cell=res["e_tot"], c=c)
            print(f"saved {out} "
                  f"({os.path.getsize(out) / 1e6:.0f} MB)", flush=True)

    print("\nsummary (f64 converged-density robust-fit deficit):")
    for c, nip, de in rows:
        bar = "PASS" if de < 1e-6 else "    "
        print(f"  c={c:5.1f}  n_ip={nip:5d}  |dE| = {de:.3e} Ha  {bar}")


if __name__ == "__main__":
    main()
