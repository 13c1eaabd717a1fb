import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def log(*a): print(*a, flush=True)
def force(o):
    for leaf in jax.tree.leaves(o):
        np.asarray(leaf)
def timeit(fn, *args, reps=10):
    t0=time.time(); force(fn(*args)); warm=time.time()-t0
    t0=time.time(); out=None
    for _ in range(reps): out=fn(*args)
    force(out)
    return warm, (time.time()-t0)/reps

t0 = time.time()
_d = jnp.asarray(np.arange(1024, dtype=np.uint32))
_i = jnp.asarray(np.arange(256, dtype=np.int32))
float(jax.jit(lambda t, i: jnp.take(t, i).sum())(_d, _i))
log(f"[prewarm]: {time.time()-t0:.1f}s")

def calib():
    n = 256 * (1 << 20) // 4
    x = jnp.asarray(np.random.randint(0, 1 << 30, n, np.uint32).reshape(-1, 128))
    f = jax.jit(lambda x: (x ^ jnp.uint32(123)).astype(jnp.float32).sum())
    warm, dt = timeit(f, x)
    log(f"[calib streamread 256MiB] {dt*1e3:.2f} ms = {256/1024/dt:.0f} GiB/s")
calib()
log("SESSION READY")
