"""Pallas AO-collocation kernel vs the float64 host evaluator.

Runs in interpreter mode on CPU (the driver's TPU run exercises the
compiled path via bench/profile tooling).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu.models import diamond_primitive
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.ops.pallas_ao import eval_ao_pallas, make_ao_evaluator, plan_ao_blocks


def test_pallas_ao_szv():
    cell = diamond_primitive(mesh=(16, 16, 16))
    ref = eval_ao_numpy(cell)
    out = np.asarray(eval_ao_pallas(cell, interpret=True, dtype=jnp.float64))
    assert np.abs(out - ref).max() < 1e-12


def test_pallas_ao_dzvp_dshell():
    cell = diamond_primitive(mesh=(12, 12, 12), basis="gth-dzvp")
    ref = eval_ao_numpy(cell)
    out = np.asarray(eval_ao_pallas(cell, interpret=True, dtype=jnp.float64))
    assert np.abs(out - ref).max() < 1e-12


def test_pallas_evaluator_reuse():
    cell = diamond_primitive(mesh=(12, 12, 12))
    ev = make_ao_evaluator(cell, interpret=True, dtype=jnp.float64)
    a = np.asarray(ev())
    b = np.asarray(ev())
    assert np.array_equal(a, b)
    assert np.abs(a - eval_ao_numpy(cell)).max() < 1e-12


def test_image_culling_reduces_work():
    cell = diamond_primitive(mesh=(16, 16, 16))
    plans, nb, NB = plan_ao_blocks(cell)
    n_images_total = len(cell.lattice_images())
    for plan in plans:
        # culling must keep every needed image but drop a large fraction
        assert plan.counts.max() <= n_images_total
        assert plan.counts.mean() < 0.7 * n_images_total


def test_few_images_small_cell():
    """Cells with fewer lattice images than the 128-padded IMAX must
    plan and evaluate (regression: the argpartition packing sliced
    [:IMAX] columns out of an nimg-wide array — IndexError on any
    large/molecular box; caught by code review with a live repro)."""
    import numpy as np
    from pyscf_isdf_tpu import build_cell

    cell = build_cell(np.eye(3) * 40.0, [["H", (20.0, 20.0, 20.0)]],
                      "gth-szv", mesh=(16, 16, 16))
    assert len(cell.lattice_images()) < 128
    out = np.asarray(eval_ao_pallas(cell, interpret=True,
                                    dtype=jnp.float64))
    assert np.abs(out - eval_ao_numpy(cell)).max() < 1e-12
