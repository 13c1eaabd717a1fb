"""Build + cache the 1 Gbp benchmark index and dense LUT (host-only)."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"  # no TPU needed for the build
os.environ.setdefault("BENCH_TEXT_SIZE", "1e9")
sys.path.insert(0, "/root/repo")
import numpy as np
import bench

t0 = time.time()
text = bench.get_text()
print(f"text: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
fm = bench.get_blob(text)
print(f"blob: {time.time()-t0:.1f}s text_len={fm.text_len}", flush=True)

from sview_fmindex_tpu.build.dense_lut import auto_dense_k, dense_lut

dk = auto_dense_k(fm.symbol_count, fm.kmer_size, 1 << 20)
path = os.path.join(bench.CACHE_DIR, f"dense_lut_{bench.TEXT_SIZE}_{bench.SEED}.npz")
if dk and not os.path.exists(path):
    t0 = time.time()
    lo, hi = dense_lut(fm, dk)
    np.savez(path, dk=dk, lo=lo, hi=hi)
    print(f"dense_lut dk={dk}: {time.time()-t0:.1f}s", flush=True)
print("BUILD DONE", flush=True)
