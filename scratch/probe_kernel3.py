"""Calibrated kernel comparison in ONE process: streamread baseline, sorts,
kernel skip/noskip at two densities."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def log(*a): print(*a, file=sys.stderr, flush=True)
def timeit(fn, *args, reps=10):
    t0=time.time(); np.asarray(jax.tree.leaves(fn(*args))[0])[:1]; warm=time.time()-t0
    t0=time.time(); out=None
    for _ in range(reps): out=fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
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
    del x
calib()

from sview_fmindex_tpu.ops import stream_join
from sview_fmindex_tpu.models.device_index import IndexMeta

N_TEXT = int(1e9)
sigma = 4
rng = np.random.default_rng(0)
bwt = rng.integers(0, sigma, N_TEXT, dtype=np.uint8)
T = 8192
tbl = stream_join.build_stream_table(sigma, bwt, T)
tbl_dev = jax.device_put(tbl); tbl_dev.block_until_ready()
log("[table] uploaded")
meta = IndexMeta(sigma=sigma, kmer_size=3, sampling_ratio=2, block_len=64,
                 num_planes=3, num_lanes=2, stream_rows=tbl.shape[0], stream_tile=T)
sentinel = jnp.uint32(12345)

for Nq in (1 << 18, 1 << 21):
    pos = jnp.asarray(rng.integers(0, N_TEXT, Nq, dtype=np.uint32))
    sym = jnp.asarray(rng.integers(0, sigma, Nq, dtype=np.int32))
    k = jnp.asarray(rng.integers(0, 1 << 30, Nq, dtype=np.uint32))
    pay = jnp.arange(Nq, dtype=jnp.int32)
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    warm, dt = timeit(f, k, pay)
    log(f"[sort Nq={Nq}] {dt*1e3:.2f} ms")
    for skip in (False, True):
        g = jax.jit(lambda tb, s, p, sy, skip=skip: stream_join.rank_next_sorted(
            meta, tb, s, p, sy, T=T, C=1024, skip_groups=skip))
        warm, dt = timeit(g, tbl_dev, sentinel, pos, sym)
        log(f"[rank Nq={Nq} skip={skip}] {dt*1e3:.2f} ms = {dt*1e9/Nq:.2f} ns/q (warm {warm:.0f}s)")
calib()
log("DONE")
