import os, sys, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def log(*a): print(*a, file=sys.stderr, flush=True)
def force(o): return float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0])
def timeit(fn, *args, reps=20):
    t0=time.time(); force(fn(*args)); warm=time.time()-t0
    t0=time.time(); out=None
    for _ in range(reps): out=fn(*args)
    force(out); return warm, (time.time()-t0)/reps

# 1. popcount inside pallas
def kern(x_ref, o_ref):
    o_ref[:] = jax.lax.population_count(x_ref[:])
x = jnp.asarray(np.random.randint(0, 1<<30, (8,128), np.uint32))
try:
    f = jax.jit(lambda x: pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8,128), jnp.uint32))(x))
    r = np.asarray(f(x))
    ok = (r == np.bitwise_count(np.asarray(x))).all()
    log(f"[popcount-pallas] works: {ok}")
except Exception as e:
    log(f"[popcount-pallas] FAILED: {type(e).__name__}: {str(e)[:200]}")

# 2. 2-row slice gather vs 1-row (lax.gather slice_sizes=(2,W))
n_rows, W, Nq = 1<<23, 16, 1<<18
tbl = jnp.asarray(np.random.randint(0, 1<<30, (n_rows, W), np.uint32))
q = jnp.asarray(np.random.randint(0, n_rows-2, Nq, np.int32))
f1 = jax.jit(lambda t, q: jnp.take(t, q, axis=0).sum(axis=(-1)))
warm, dt = timeit(f1, tbl, q); log(f"[gather 1row] {dt*1e9/Nq:.2f} ns/q")
import jax.lax as lax
dn = lax.GatherDimensionNumbers(offset_dims=(1,2), collapsed_slice_dims=(), start_index_map=(0,))
f2 = jax.jit(lambda t, q: lax.gather(t, q[:,None], dn, slice_sizes=(2,W)).sum(axis=(1,2)))
r1 = np.asarray(jnp.take(tbl, q, axis=0).sum(axis=-1)) + np.asarray(jnp.take(tbl, q+1, axis=0).sum(axis=-1))
r2 = np.asarray(f2(tbl, q))
log(f"[gather 2row] correct: {(r1==r2).all()}")
warm, dt = timeit(f2, tbl, q); log(f"[gather 2row] {dt*1e9/Nq:.2f} ns/q")

# 3. duplicate-index gather (all lanes same index)
qd = jnp.zeros(Nq, jnp.int32)
warm, dt = timeit(f1, tbl, qd); log(f"[gather dup-idx] {dt*1e9/Nq:.2f} ns/q")
# 4. half dup
qh = jnp.asarray(np.where(np.arange(Nq)%2, np.asarray(q), 0).astype(np.int32))
warm, dt = timeit(f1, tbl, qh); log(f"[gather half-dup] {dt*1e9/Nq:.2f} ns/q")
log("DONE")
