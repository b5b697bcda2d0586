import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from pyscf_isdf_tpu.models import diamond_supercell
from pyscf_isdf_tpu.ops.pallas_ao import make_ao_evaluator
from pyscf_isdf_tpu.ops.interp_points import pivoted_cholesky_points, pivoted_cholesky_points_blocked

cell = diamond_supercell(nrep=(3,3,3), mesh=(48,48,48))
aoR = make_ao_evaluator(cell, dtype=jnp.float32)()
aoR.block_until_ready()
print('aoR ready', aoR.shape, flush=True)
nip = 1728
for name, fn in [("greedy", lambda: pivoted_cholesky_points(aoR, nip)),
                 ("blocked64", lambda: pivoted_cholesky_points_blocked(aoR, nip, 64))]:
    t0=time.time(); idx,_ = fn(); idx.block_until_ready()
    t1=time.time(); idx,_ = fn(); idx.block_until_ready()
    print(f'{name}: compile+run {t1-t0:.2f}s, rerun {time.time()-t1:.2f}s, unique {len(np.unique(np.asarray(idx)))}', flush=True)
