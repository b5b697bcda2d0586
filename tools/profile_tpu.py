import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from pyscf_isdf_tpu.models import diamond_supercell
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.ops import coulomb
from pyscf_isdf_tpu.df import fftdf, isdf as isdf_mod

def timeit(fn, *a, reps=5):
    for _ in range(2): jax.block_until_ready(fn(*a))
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); jax.block_until_ready(fn(*a)); ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3

dtype = jnp.float32
cell = diamond_supercell(nrep=(2,2,2), mesh=(32,32,32))
aoR = jnp.asarray(eval_ao_numpy(cell), dtype)
coulG = jnp.asarray(coulomb.get_coulG(cell), dtype)
mesh3 = tuple(cell.mesh); w = cell.grid_weight
dm0 = jnp.asarray(2.0/cell.nao*np.eye(cell.nao), dtype)
t0=time.time()
isdf = isdf_mod.build_isdf(aoR, coulG, mesh3, w, c=8.0)
jax.block_until_ready(isdf.W)
print('isdf build:', time.time()-t0, flush=True)

N = 16
def chain(jk):
    def run(dm):
        def body(i, d):
            vj, vk = jk(d)
            f = vj - 0.5*vk
            return d + 1e-6 * (f - jnp.trace(f)/d.shape[0]*jnp.eye(d.shape[0], dtype=d.dtype))
        return jax.lax.fori_loop(0, N, body, dm)
    return jax.jit(run)

jk_isdf = lambda d: (fftdf.get_j(aoR, d, coulG, mesh3, w), isdf_mod.get_k(isdf, d))
t0=time.time(); f1 = chain(jk_isdf); r=f1(dm0); jax.block_until_ready(r)
print('isdf chain compile:', time.time()-t0, flush=True)
t_isdf = timeit(f1, dm0)/N
print(f'ISDF J+K per iter: {t_isdf:.2f} ms', flush=True)

jk_fftdf = lambda d: (fftdf.get_j(aoR, d, coulG, mesh3, w), fftdf.get_k(aoR, d, coulG, mesh3, w))
t0=time.time(); f2 = chain(jk_fftdf); r=f2(dm0); jax.block_until_ready(r)
print('fftdf chain compile:', time.time()-t0, flush=True)
t_fftdf = timeit(f2, dm0)/N
print(f'FFTDF J+K per iter: {t_fftdf:.2f} ms | speedup {t_fftdf/t_isdf:.1f}x', flush=True)

jk_pure = lambda d: (isdf_mod.get_j(isdf, d), isdf_mod.get_k(isdf, d))
f3 = chain(jk_pure); jax.block_until_ready(f3(dm0))
t_pure = timeit(f3, dm0)/N
print(f'pure-ISDF J+K per iter: {t_pure:.3f} ms | speedup vs FFTDF {t_fftdf/t_pure:.1f}x', flush=True)
