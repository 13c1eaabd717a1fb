"""Kernel v2 cost at 1 Gbp scale: T x C sweep on synthetic BWT."""
import os, sys, time, dataclasses
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def log(*a): print(*a, file=sys.stderr, flush=True)
def timeit(fn, *args, reps=8):
    t0=time.time(); np.asarray(jax.tree.leaves(fn(*args))[0])[:1]; warm=time.time()-t0
    t0=time.time(); out=None
    for _ in range(reps): out=fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    return warm, (time.time()-t0)/reps

# 1. gather prewarm FIRST, on an empty device
t0 = time.time()
_d = jnp.asarray(np.arange(1024, dtype=np.uint32))
_i = jnp.asarray(np.arange(256, dtype=np.int32))
float(jax.jit(lambda t, i: jnp.take(t, i).sum())(_d, _i))
log(f"[prewarm empty-device]: {time.time()-t0:.1f}s")

from sview_fmindex_tpu.ops import stream_join
from sview_fmindex_tpu.models.device_index import IndexMeta

N_TEXT = int(1e9)
sigma = 4
rng = np.random.default_rng(0)
bwt = rng.integers(0, sigma, N_TEXT, dtype=np.uint8)
log("bwt built")

Nq = 262144
pos_np = rng.integers(0, N_TEXT, Nq, dtype=np.uint32)
sym_np = rng.integers(0, sigma, Nq, dtype=np.int32)
pos = jnp.asarray(pos_np); sym = jnp.asarray(sym_np)
sentinel = jnp.uint32(12345)

import functools
for T in (4096, 8192, 16384):
    t0 = time.time()
    tbl = stream_join.build_stream_table(sigma, bwt, T)
    log(f"[table T={T}] host build {time.time()-t0:.1f}s rows={tbl.shape}")
    tbl_dev = jax.device_put(tbl)
    tbl_dev.block_until_ready()
    meta = IndexMeta(sigma=sigma, kmer_size=3, sampling_ratio=2, block_len=64,
                     num_planes=3, num_lanes=2, stream_rows=tbl.shape[0],
                     stream_tile=T)
    for C in (1024, 2048, 4096):
        f = jax.jit(functools.partial(stream_join.rank_next_sorted, meta, T=T, C=C),
                    static_argnames=())
        g = jax.jit(lambda tb, s, p, sy: stream_join.rank_next_sorted(meta, tb, s, p, sy, T=T, C=C))
        warm, dt = timeit(g, tbl_dev, sentinel, pos, sym)
        log(f"[rank T={T} C={C}] {dt*1e3:.2f} ms = {dt*1e9/Nq:.2f} ns/q (warm {warm:.0f}s)")
    del tbl_dev
log("DONE")
