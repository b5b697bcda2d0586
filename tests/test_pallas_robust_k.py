"""Fused Pallas robust-K cross-term kernel == XLA reference.

Interpret mode on CPU (the same kernel runs compiled on TPU; the XLA
path materializes two (ng, n_ip) HBM tensors the kernel keeps in VMEM).
"""
import numpy as np
import jax.numpy as jnp

from pyscf_isdf_tpu.ops.pallas_robust_k import robust_k_cross


def test_fused_cross_term_parity():
    rng = np.random.default_rng(0)
    ng, nao, nip = 1000, 30, 200
    aoR = jnp.asarray(rng.standard_normal((ng, nao)))
    B = jnp.asarray(rng.standard_normal((nip, nao)))
    Vxi = jnp.asarray(rng.standard_normal((nip, ng)))
    ref = (Vxi.T * (aoR @ B.T)).T @ aoR
    out = robust_k_cross(aoR, B, Vxi, tg=256, tp=64, interpret=True)
    assert float(jnp.abs(out - ref).max()) < 1e-10


def test_fused_cross_term_padding():
    """Non-divisible ng/nip exercise the zero-padding path."""
    rng = np.random.default_rng(1)
    ng, nao, nip = 777, 11, 70
    aoR = jnp.asarray(rng.standard_normal((ng, nao)))
    B = jnp.asarray(rng.standard_normal((nip, nao)))
    Vxi = jnp.asarray(rng.standard_normal((nip, ng)))
    ref = (Vxi.T * (aoR @ B.T)).T @ aoR
    out = robust_k_cross(aoR, B, Vxi, tg=128, tp=32, interpret=True)
    assert float(jnp.abs(out - ref).max()) < 1e-10
