import sys, time
import numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
def run(name, fn, *args):
    t0 = time.time(); np.asarray(fn(*args)); t1 = time.time()
    np.asarray(fn(*args)); t2 = time.time()
    log(f"[{name}] first {t1-t0:.1f}s second {t2-t1:.3f}s")

A = jnp.asarray(np.random.randint(0, 1000, 1 << 20, np.uint32))
B = jnp.asarray(np.random.randint(0, 1000, 1 << 20, np.uint32))
C = jnp.asarray(np.random.randint(0, 1000, 1 << 22, np.uint32))
i4k = jnp.asarray(np.random.randint(0, 1 << 20, 4096, np.int32))
i8k = jnp.asarray(np.random.randint(0, 1 << 20, 8192, np.int32))

f = jax.jit(lambda t, i: jnp.take(t, i).sum())
run("A-4k", f, A, i4k)          # new shape (tbl 1M, idx 4k)
run("B-4k same shape", f, B, i4k)   # same shapes, different buffer
run("A-8k new idx shape", f, A, i8k)
run("C-4k new tbl shape", f, C, i4k)
g = jax.jit(lambda t, i: jnp.take(t, i).max())  # same gather, different program
run("A-4k new program", g, A, i4k)
log("DONE")
