import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from pyscf_isdf_tpu.models import diamond_supercell
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy, eval_ao, PackedBasis
from pyscf_isdf_tpu.ops.pallas_ao import eval_ao_pallas

cell = diamond_supercell(nrep=(2,2,2), mesh=(32,32,32))
print('natm', cell.natm, 'ngrids', cell.ngrids, flush=True)

t0=time.time()
out = eval_ao_pallas(cell, dtype=jnp.float32)
out.block_until_ready()
print('pallas aoR compile+run:', time.time()-t0, flush=True)
t0=time.time(); out = eval_ao_pallas(cell, dtype=jnp.float32); out.block_until_ready()
print('pallas aoR (incl host replan):', time.time()-t0, flush=True)

ref = eval_ao_numpy(cell)
print('pallas vs host f64 max diff:', np.abs(np.asarray(out, np.float64)-ref).max(),
      'scale', np.abs(ref).max(), flush=True)

# XLA evaluator
packed = PackedBasis.from_cell(cell)
coords = jnp.asarray(cell.uniform_grid(), jnp.float32)
images = jnp.asarray(cell.lattice_images(), jnp.float32)
t0=time.time()
out2 = eval_ao(packed, coords, images); out2.block_until_ready()
print('xla aoR compile+run:', time.time()-t0, flush=True)
t0=time.time(); out2 = eval_ao(packed, coords, images); out2.block_until_ready()
print('xla aoR rerun:', time.time()-t0, flush=True)

from pyscf_isdf_tpu.ops.pallas_ao import make_ao_evaluator
ev = make_ao_evaluator(cell, dtype=jnp.float32)
out3 = ev(); out3.block_until_ready()
t0=time.time(); out3 = ev(); out3.block_until_ready()
print('pallas aoR device-only rerun:', time.time()-t0, flush=True)
print('pallas evaluator vs host:', np.abs(np.asarray(out3, np.float64)-ref).max(), flush=True)
