"""Measure TPU primitive costs that bound the FM-index engine design.

Run on the real chip. Prints one line per measurement.
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

def timeit(fn, *args, reps=5):
    # warmup
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    warm = time.time() - t0
    # force full materialization each rep (axon acks early)
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        leaves = jax.tree.leaves(o)
        float(leaves[0].ravel()[0])
    dt = (time.time() - t0) / reps
    return warm, dt

log("devices:", jax.devices())

# ---- 1. compile latency for a tiny fresh program ----
t0 = time.time()
r = jax.jit(lambda x: x * 3 + 1)(jnp.ones(128)).block_until_ready()
log(f"[compile] tiny fresh jit: {time.time()-t0:.1f}s")
t0 = time.time()
r = jax.jit(lambda x: x * 5 + 2)(jnp.ones(128)).block_until_ready()
log(f"[compile] tiny fresh jit #2: {time.time()-t0:.1f}s")

# ---- 2. sort cost: u32 keys + u32 payload ----
for N in (1 << 18, 1 << 20, 1 << 22):
    keys = jnp.asarray(np.random.randint(0, 1 << 30, N, dtype=np.uint32))
    pay = jnp.arange(N, dtype=jnp.uint32)
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    warm, dt = timeit(f, keys, pay)
    log(f"[sort] N={N}: {dt*1e9/N:.2f} ns/elt  ({dt*1e3:.2f} ms; warm {warm:.1f}s)")

# ---- 3. XLA row gather from a big table ----
for n_rows, width in ((1 << 24, 16), (1 << 23, 16), (1 << 24, 8)):
    tbl = jnp.asarray(np.random.randint(0, 1 << 30, (n_rows, width), dtype=np.uint32))
    for Nq in (1 << 18,):
        q = jnp.asarray(np.random.randint(0, n_rows, Nq, dtype=np.int32))
        f = jax.jit(lambda t, q: jnp.take(t, q, axis=0).sum(axis=-1))
        warm, dt = timeit(f, tbl, q)
        log(f"[gather] rows={n_rows} w={width} Nq={Nq}: {dt*1e9/Nq:.2f} ns/row ({dt*1e3:.2f} ms; warm {warm:.1f}s)")

# ---- 3b. gather + in-loop (sequential dependency, 8 steps) ----
n_rows, width = 1 << 24, 16
tbl = jnp.asarray(np.random.randint(0, 1 << 30, (n_rows, width), dtype=np.uint32))
Nq = 1 << 18
q0 = jnp.asarray(np.random.randint(0, n_rows, Nq, dtype=np.uint32))
def chain(t, q):
    def body(i, q):
        rows = jnp.take(t, q.astype(jnp.int32), axis=0)
        return (rows.sum(axis=-1) + q) % jnp.uint32(n_rows)
    return jax.lax.fori_loop(0, 8, body, q)
warm, dt = timeit(jax.jit(chain), tbl, q0)
log(f"[gather-chain] 8 steps x {Nq}: {dt*1e9/(8*Nq):.2f} ns/row ({dt*1e3:.2f} ms; warm {warm:.1f}s)")

# ---- 4. full-table stream read bandwidth (big contiguous reduce) ----
for mb in (128, 512):
    n = mb * (1 << 20) // 4
    x = jnp.asarray(np.random.randint(0, 1 << 30, n, dtype=np.uint32).reshape(-1, 128))
    f = jax.jit(lambda x: (x ^ jnp.uint32(123)).sum(dtype=jnp.uint32))
    warm, dt = timeit(f, x)
    log(f"[streamread] {mb} MiB: {dt*1e3:.2f} ms = {mb/1024/dt:.0f} GiB/s (warm {warm:.1f}s)")

# ---- 5. while_loop iteration overhead (tiny body) ----
def wl(x):
    def cond(c): return c[0] < 100
    def body(c): return (c[0] + 1, c[1] * 1.00001)
    return jax.lax.while_loop(cond, body, (jnp.int32(0), x))
warm, dt = timeit(jax.jit(wl), jnp.ones(128))
log(f"[while] 100 tiny iters: {dt*1e6:.1f} us -> {dt*1e6/100:.2f} us/iter (warm {warm:.1f}s)")

# ---- 6. dispatch overhead: trivial jit call ----
f = jax.jit(lambda x: x + 1)
warm, dt = timeit(f, jnp.ones(128), reps=20)
log(f"[dispatch] trivial jit: {dt*1e6:.1f} us/call")

log("DONE")
