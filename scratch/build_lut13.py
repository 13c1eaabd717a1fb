"""Build + cache the dk=13 dense LUT and the full-SA cache for the 1 Gbp bench."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("BENCH_TEXT_SIZE", "1e9")
sys.path.insert(0, "/root/repo")
import numpy as np
import bench

text = bench.get_text()
fm = bench.get_blob(text)

from sview_fmindex_tpu.build.dense_lut import auto_dense_k, dense_lut

dk = auto_dense_k(fm.symbol_count, fm.kmer_size, 1 << 26, text_len=fm.text_len)
print(f"dk={dk}", flush=True)
path = os.path.join(bench.CACHE_DIR, f"dense_lut_{bench.TEXT_SIZE}_{bench.SEED}.npz")
need = True
try:
    with np.load(path) as z:
        need = int(z["dk"]) != dk
except OSError:
    pass
if need:
    t0 = time.time()
    lo, hi = dense_lut(fm, dk)
    np.savez(path, dk=dk, lo=lo, hi=hi)
    print(f"dense_lut dk={dk}: {time.time()-t0:.1f}s", flush=True)

# full-SA cache: derive from a fresh SA-IS run (the blob has only r=2)
sa_path = os.path.join(bench.CACHE_DIR, f"sa_full_{bench.TEXT_SIZE}_{bench.SEED}.u32")
if not os.path.exists(sa_path):
    from sview_fmindex_tpu.build.count_array import encode_text
    from sview_fmindex_tpu.build.suffix_array import suffix_array

    t0 = time.time()
    enc_plus1 = encode_text(np.frombuffer(text, np.uint8), fm.encoder.table)
    ws = np.empty(len(enc_plus1) + 1, dtype=np.uint8)
    ws[:-1] = enc_plus1
    ws[-1] = 0
    sa = suffix_array(ws)
    sa[1:].astype("<u4", copy=False).tofile(sa_path)
    print(f"sa_full: {time.time()-t0:.1f}s", flush=True)
print("LUT13 DONE", flush=True)
