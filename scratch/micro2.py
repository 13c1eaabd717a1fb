"""TPU primitive costs, tunnel-safe methodology.

Enqueue R reps back-to-back, force ONLY the last rep's value (device executes
in-order, so the last completion implies all executed), subtract nothing:
with exec*R >> RTT the per-rep number is honest.
"""
import os, sys, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/bench_cache/xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def force(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.asarray(leaves[0]).ravel()[0])

def timeit(fn, *args, reps=20):
    t0 = time.time()
    out = fn(*args)
    force(out)
    warm = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0) / reps
    return warm, dt

# ---- 0. RTT ----
f = jax.jit(lambda x: x + 1)
x = jnp.ones(8)
force(f(x))
t0 = time.time()
for _ in range(10):
    force(f(x))
log(f"[rtt] force roundtrip: {(time.time()-t0)/10*1e3:.1f} ms")

# ---- sort: u32 keys + u32 payload ----
for N in (1 << 18, 1 << 21):
    keys = jnp.asarray(np.random.randint(0, 1 << 30, N, dtype=np.uint32))
    pay = jnp.arange(N, dtype=jnp.uint32)
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    warm, dt = timeit(f, keys, pay, reps=30)
    log(f"[sort] N={N}: {dt*1e9/N:.2f} ns/elt ({dt*1e3:.2f} ms)")

# ---- argsort-free double sort (sort + unsort) as used per LF step ----
N = 1 << 18
keys = jnp.asarray(np.random.randint(0, 1 << 26, N, dtype=np.uint32))
def sort_unsort(k):
    packed = jnp.arange(N, dtype=jnp.uint32)
    sk, sp = jax.lax.sort((k, packed), num_keys=1)
    r = sk ^ jnp.uint32(1)
    _, out = jax.lax.sort((sp, r), num_keys=1)
    return out
warm, dt = timeit(jax.jit(sort_unsort), keys, reps=30)
log(f"[sort+unsort] N={N}: {dt*1e9/N:.2f} ns/elt ({dt*1e3:.2f} ms)")

# ---- XLA row gather ----
for n_rows, width, Nq in ((1 << 24, 16, 1 << 18), (1 << 24, 16, 1 << 21), (1 << 21, 16, 1 << 18)):
    tbl = jnp.asarray(np.random.randint(0, 1 << 30, (n_rows, width), dtype=np.uint32))
    q = jnp.asarray(np.random.randint(0, n_rows, Nq, dtype=np.int32))
    f = jax.jit(lambda t, q: jnp.take(t, q, axis=0).sum(axis=-1))
    warm, dt = timeit(f, tbl, q, reps=20)
    log(f"[gather] rows={n_rows} w={width} Nq={Nq}: {dt*1e9/Nq:.2f} ns/row ({dt*1e3:.2f} ms)")

# ---- 1D gather (single word per query) ----
n = 1 << 28
tbl1 = jnp.asarray(np.random.randint(0, 1 << 30, n, dtype=np.uint32))
q = jnp.asarray(np.random.randint(0, n, 1 << 18, dtype=np.int32))
f = jax.jit(lambda t, q: jnp.take(t, q).sum())
warm, dt = timeit(f, tbl1, q, reps=20)
log(f"[gather1d] n={n} Nq={1<<18}: {dt*1e9/(1<<18):.2f} ns/q ({dt*1e3:.2f} ms)")

# ---- gather chain (8 dependent steps, as in LF loop) ----
n_rows, width = 1 << 24, 16
tbl = jnp.asarray(np.random.randint(0, 1 << 30, (n_rows, width), dtype=np.uint32))
for Nq in (1 << 18, 1 << 19):
    q0 = jnp.asarray(np.random.randint(0, n_rows, Nq, dtype=np.uint32))
    def chain(t, q):
        def body(i, q):
            rows = jnp.take(t, q.astype(jnp.int32), axis=0)
            return (rows.sum(axis=-1) + q) % jnp.uint32(n_rows)
        return jax.lax.fori_loop(0, 8, body, q)
    warm, dt = timeit(jax.jit(chain), tbl, q0, reps=20)
    log(f"[gather-chain] 8 x {Nq}: {dt*1e9/(8*Nq):.2f} ns/row ({dt*1e3:.2f} ms)")

# ---- stream read bandwidth ----
for mb in (256,):
    n = mb * (1 << 20) // 4
    x = jnp.asarray(np.random.randint(0, 1 << 30, n, dtype=np.uint32).reshape(-1, 128))
    f = jax.jit(lambda x: (x ^ jnp.uint32(123)).astype(jnp.float32).sum())
    warm, dt = timeit(f, x, reps=20)
    log(f"[streamread] {mb} MiB: {dt*1e3:.2f} ms = {mb/1024/dt:.0f} GiB/s")

# ---- while_loop overhead ----
def wl(x):
    def cond(c): return c[0] < 100
    def body(c): return (c[0] + 1, c[1] * 1.00001)
    return jax.lax.while_loop(cond, body, (jnp.int32(0), x))
warm, dt = timeit(jax.jit(wl), jnp.ones(128), reps=20)
log(f"[while] 100 tiny iters: {dt*1e6:.1f} us -> {dt*1e6/100:.2f} us/iter")

# ---- fori_loop with gather body vs unrolled: dispatch-free step cost ----
log("DONE")
