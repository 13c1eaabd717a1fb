import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/xla_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import sview_fmindex_tpu as fmx
from sview_fmindex_tpu.utils.patterns import pack_patterns

rng = np.random.default_rng(3)
text = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=200_000).tobytes()
enc = fmx.EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
b = fmx.FmIndexBuilder(len(text), enc.symbol_count(), enc, position="u32",
                       block=fmx.BLOCK3_U64,
                       suffix_array_config=fmx.SuffixArrayConfig.compressed(2),
                       lookup_table_config=fmx.LookupTableConfig.kmer_size(3))
fm = fmx.FmIndex.load(b.build(text), position="u32", block=fmx.BLOCK3_U64,
                      encoder_kind="table")
dev = fm.to_device(dense_lut_entries=1 << 16)
print("devices:", jax.devices(), "dk:", dev.meta.dense_k, file=sys.stderr, flush=True)

pats = [text[s:s+20] for s in rng.integers(0, len(text)-20, 2000)]
pats += [text[s:s+3] for s in rng.integers(0, len(text)-3, 64)]  # short + walk-heavy
batch, lens = pack_patterns(pats)
t0 = time.time()
c_g = np.asarray(dev.count(batch, lens, use_stream=False))
print(f"gather count: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0 = time.time()
c_s = np.asarray(dev.count(batch, lens, use_stream=True))
print(f"stream count: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
assert (c_g == c_s).all(), f"count mismatch: {np.nonzero(c_g != c_s)[0][:10]}"

def collect(use_stream):
    locs, pids, valid = map(np.asarray, dev.locate(batch, lens, use_stream=use_stream))
    out = {}
    for l, p, v in zip(locs, pids, valid):
        if v: out.setdefault(int(p), []).append(int(l))
    return {k: sorted(v) for k, v in out.items()}
t0 = time.time()
lg = collect(False); ls_ = collect(True)
print(f"locates: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
assert lg == ls_
# host oracle spot check
for i in (0, 1, 2, 2000, 2063):
    assert ls_.get(i, []) == sorted(fm.locate(pats[i])), i
print("STREAM-TPU OK", flush=True)
