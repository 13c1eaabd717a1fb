"""Decompose the 1 Gbp query-engine cost on the real chip.

Tunnel-safe timing: enqueue R reps, force only the last rep's scalar.
Answers: upload BW, per-LF-step cost (stream vs gather), walk cost,
SA-gather cost, seed cost, compile times.
"""
import os, sys, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/bench_cache/xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

TEXT_SIZE = int(float(os.environ.get("BENCH_TEXT_SIZE", "1e9")))
B = int(float(os.environ.get("PROBE_B", "1e5")))
CACHE = "/root/repo/bench_cache"

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def force(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.asarray(leaves[0]).ravel()[-1].astype(jnp.float32))

def timeit(fn, *args, reps=8):
    t0 = time.time()
    force(fn(*args))
    warm = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0) / reps
    return warm, dt

log("devices:", jax.devices())

# ---- load host index ----
import bench
from sview_fmindex_tpu import FmIndex, BLOCK3_U64

t0 = time.time()
text = bench.get_text()
mm = np.memmap(os.path.join(CACHE, f"index_{TEXT_SIZE}_42_b3u64_r2_k3.blob"),
               dtype=np.uint8, mode="r")
fm = FmIndex.load(mm, position="u32", block=BLOCK3_U64, encoder_kind="table")
log(f"[host] load: {time.time()-t0:.1f}s text_len={fm.text_len}")

# ---- upload bandwidth probe ----
t0 = time.time()
sa_dev = jax.device_put(np.ascontiguousarray(fm.suffix_array))
sa_dev.block_until_ready()
up = time.time() - t0
gb = fm.suffix_array.nbytes / 2**30
log(f"[upload] SA {gb:.2f} GiB in {up:.1f}s = {gb/up:.2f} GiB/s")

# ---- full device upload ----
t0 = time.time()
dev = fm.to_device(dense_lut_cache=os.path.join(CACHE, f"dense_lut_{TEXT_SIZE}_42.npz"))
jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
             [dev.fused, dev.sa, dev.stream_tbl, dev.dense_lo])
log(f"[upload] full index (dense_k={dev.meta.dense_k}, "
    f"fused {dev.fused.nbytes/2**30:.2f} + sa {dev.sa.nbytes/2**30:.2f} + "
    f"stream {dev.stream_tbl.nbytes/2**30:.2f} GiB): {time.time()-t0:.1f}s")

# ---- patterns ----
rng = np.random.default_rng(43)
starts = rng.integers(0, TEXT_SIZE - 20, size=B)
text_arr = np.frombuffer(text, np.uint8)
patterns = jnp.asarray(np.stack([text_arr[s : s + 20] for s in starts]))
lens = jnp.full(B, 20, dtype=jnp.int32)

from sview_fmindex_tpu.ops import search as search_ops
from sview_fmindex_tpu.ops import locate as locate_ops
import functools

# ---- per-step cost: ranges at steps = 0/4/8/10, stream and gather ----
@functools.partial(jax.jit, static_argnums=(3, 4))
def ranges(idx, pats, lens, steps, use_stream):
    sym = search_ops.encode_patterns(idx.enc_table, pats)
    return search_ops.pos_ranges(
        idx.meta, idx.fused, idx.kmer_tbl, idx.dense_lo, idx.dense_hi,
        idx.count_arr, idx.sentinel, sym, lens, steps,
        stream_tbl=idx.stream_tbl, use_stream=use_stream)

for use_stream in (True, False):
    prev = None
    for steps in (0, 4, 8, 10):
        warm, dt = timeit(lambda: ranges(dev, patterns, lens, steps, use_stream), reps=6)
        slope = "" if prev is None else f" slope {1e3*(dt-prev[1])/(steps-prev[0]):.2f} ms/step"
        log(f"[ranges stream={use_stream}] steps={steps}: {dt*1e3:.1f} ms (warm {warm:.0f}s){slope}")
        prev = (steps, dt)

# ---- count correctness anchor ----
lo, hi = ranges(dev, patterns, lens, 10, True)
lo2, hi2 = ranges(dev, patterns, lens, 10, False)
assert (np.asarray(lo) == np.asarray(lo2)).all() and (np.asarray(hi) == np.asarray(hi2)).all(), "stream/gather mismatch"
counts = np.asarray(hi) - np.asarray(lo)
total = int(counts.sum())
log(f"[count] total hits {total} (engines agree)")

# ---- walk cost: stream vs gather ----
capacity = max(1 << (total - 1).bit_length(), 1024)
@functools.partial(jax.jit, static_argnums=(3, 4))
def walk(idx, lo, hi, capacity, use_stream):
    return locate_ops.locate_rows(
        idx.meta, idx.fused, idx.count_arr, idx.sa, idx.sentinel, lo, hi,
        capacity, stream_tbl=idx.stream_tbl, use_stream=use_stream)

for use_stream in (True, False):
    warm, dt = timeit(lambda: walk(dev, lo, hi, capacity, use_stream), reps=6)
    log(f"[walk stream={use_stream}] capacity={capacity}: {dt*1e3:.1f} ms (warm {warm:.0f}s)")

# ---- end-to-end locate throughput (current engines) ----
for use_stream in (True, False):
    def full(p, l):
        lo, hi = ranges(dev, p, l, 10, use_stream)
        return walk(dev, lo, hi, capacity, use_stream)
    warm, dt = timeit(full, patterns, lens, reps=6)
    log(f"[locate e2e stream={use_stream}]: {dt*1e3:.1f} ms = {B/dt/1e6:.3f} Mq/s")

log("DONE")
