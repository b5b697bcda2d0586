"""Fused Pallas kernel for the robust-ISDF exchange cross term.

The robust-fit K (df/isdf.get_k_robust) needs

    C[P, nu] = sum_g Vxi[P, g] * (sum_mu aoR[g, mu] B[P, mu]) * aoR[g, nu]

The XLA formulation materializes TWO (ng, n_ip) HBM tensors per
iteration (t = aoR B^T and z = Vxi^T * t, ~1.5 GB each at the 3x3x3
bench scale) because the elementwise product between the two MXU GEMMs
cannot fuse into either — the op is HBM-bandwidth-bound, not
FLOP-bound. This kernel tiles over (P, g), keeps t/z entirely in VMEM
(never written to HBM), streams Vxi exactly once, and accumulates C in
the revisited output block across the minor g-axis of the grid — the
Pallas double-buffered pipelining the SURVEY §2.5 prefetch row calls
for (block DMAs overlap compute automatically via the grid pipeline).

Parity: == the XLA path to f32 roundoff (tests/test_pallas_robust_k.py,
interpret mode on CPU); opt-in via get_k_robust(use_pallas=True) /
BENCH_USE_PALLAS=1.

MEASURED (v5e, diamond 3x3x3 bench config, ng=110592 nip=3456 nao=216):
6.10 ms/iter vs 2.69 ms for the XLA formulation — the fused kernel LOSES
2.3x. Accounting: the (p, g) tiling re-streams aoR once per p-tile
(27 x 95 MB = 2.6 GB) which exceeds the 2 x 1.5 GB of t/z traffic it
saves; XLA's two pipelined MXU GEMMs are already near the HBM roofline.
Kept as the documented Pallas-pipeline exemplar and for shapes where
nip/nao ratios invert the tradeoff (nao large, nip small: aoR re-reads
amortize). Default stays XLA.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(aoR_ref, B_ref, vxi_ref, out_ref):
    g = pl.program_id(1)
    a = aoR_ref[:]                                        # (TG, nao)
    t = jax.lax.dot_general(a, B_ref[:],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=a.dtype)      # (TG, TP)
    z = t * vxi_ref[:].T                                  # (TG, TP)
    c = jax.lax.dot_general(z, a, (((0,), (0,)), ((), ())),
                            preferred_element_type=a.dtype)      # (TP, nao)

    @pl.when(g == 0)
    def _():
        out_ref[:] = c.astype(out_ref.dtype)

    @pl.when(g > 0)
    def _():
        out_ref[:] = out_ref[:] + c.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tg", "tp", "interpret"))
def robust_k_cross(aoR, B, Vxi, tg: int = 512, tp: int = 128,
                   interpret: bool = False):
    """C[P, nu] = sum_g Vxi[P, g] (aoR B^T)[g, P] aoR[g, nu].

    Args:
        aoR: (ng, nao); B: (n_ip, nao) = aoRg @ dm; Vxi: (n_ip, ng).
    Returns (n_ip, nao).
    """
    ng, nao = aoR.shape
    nip = B.shape[0]
    ng_p = -(-ng // tg) * tg
    nip_p = -(-nip // tp) * tp
    aoR_p = jnp.pad(aoR, ((0, ng_p - ng), (0, 0)))
    B_p = jnp.pad(B, ((0, nip_p - nip), (0, 0)))
    Vxi_p = jnp.pad(Vxi, ((0, nip_p - nip), (0, ng_p - ng)))

    out = pl.pallas_call(
        _kernel,
        grid=(nip_p // tp, ng_p // tg),
        in_specs=[
            pl.BlockSpec((tg, nao), lambda p, g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, nao), lambda p, g: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tg), lambda p, g: (p, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, nao), lambda p, g: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nip_p, nao), aoR.dtype),
        interpret=interpret,
    )(aoR_p, B_p, Vxi_p)
    return out[:nip]
