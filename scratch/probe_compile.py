"""Isolate what makes the count program compile for minutes on axon."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

def log(*a): print(*a, file=sys.stderr, flush=True)
B = 2064

def t_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    log(f"[{name}] lower {t1-t0:.1f}s compile {t2-t1:.1f}s")
    return compiled

idx = jnp.asarray(np.random.randint(0, 125, B, np.int32))
tbl125 = jnp.asarray(np.random.randint(0, 1000, 125, np.uint32))
tbl5 = jnp.asarray(np.random.randint(0, 1000, 5, np.uint32))
tbl1m = jnp.asarray(np.random.randint(0, 1000, 1 << 20, np.uint32))

t_compile("take-125", lambda t, i: jnp.take(t, i), tbl125, idx)
t_compile("take-5", lambda t, i: jnp.take(t, jnp.clip(i, 0, 4)), tbl5, idx)
t_compile("take-1M", lambda t, i: jnp.take(t, i), tbl1m, idx)

# fori_loop with row gather from a [n,10] table (the rank loop shape)
tbl2d = jnp.asarray(np.random.randint(0, 1000, (1 << 15, 10), np.uint32))
def loop10(t, q):
    def body(i, q):
        rows = jnp.take(t, q.astype(jnp.int32), axis=0)
        ck = jnp.take_along_axis(rows, (q % 4).astype(jnp.int32)[:, None], axis=-1)[:, 0]
        return (ck + q) % jnp.uint32(1 << 15)
    return jax.lax.fori_loop(0, 10, body, q)
t_compile("loop10-rowgather+tka", loop10, tbl2d, jnp.asarray(np.random.randint(0, 1 << 15, 2 * B, np.uint32)))

# take_along_axis on [B, 20] (digit extraction)
sym = jnp.asarray(np.random.randint(0, 4, (B, 20), np.int32))
j = jnp.asarray(np.random.randint(0, 20, B, np.int32))
t_compile("take_along_axis-B20", lambda s, j: jnp.take_along_axis(s, j[:, None], axis=-1)[:, 0], sym, j)
log("DONE")
