"""Split lower/compile/first-exec on the REAL count program (tiny index)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import sview_fmindex_tpu as fmx
from sview_fmindex_tpu.utils.patterns import pack_patterns
from sview_fmindex_tpu.models import device_index as di
from sview_fmindex_tpu.ops import search as search_ops

def log(*a): print(*a, file=sys.stderr, flush=True)

rng = np.random.default_rng(3)
text = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=200_000).tobytes()
enc = fmx.EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
b = fmx.FmIndexBuilder(len(text), enc.symbol_count(), enc, position="u32",
                       block=fmx.BLOCK3_U64,
                       suffix_array_config=fmx.SuffixArrayConfig.compressed(2),
                       lookup_table_config=fmx.LookupTableConfig.kmer_size(3))
fm = fmx.FmIndex.load(b.build(text), position="u32", block=fmx.BLOCK3_U64,
                      encoder_kind="table")
dev = fm.to_device(dense_lut_entries=1 << 16, stream=False)
log("uploaded, dk:", dev.meta.dense_k)

pats = [text[s:s+20] for s in rng.integers(0, len(text)-20, 2000)]
pats += [text[s:s+3] for s in rng.integers(0, len(text)-3, 64)]
batch, lens = pack_patterns(pats)
patterns, lens_j, steps, facts = di._as_batch(dev.meta, batch, lens)
log("steps:", steps, "facts:", facts)

def ranges(idx, patterns, lens):
    sym = search_ops.encode_patterns(idx.enc_table, patterns, idx.meta)
    return search_ops.pos_ranges(
        idx.meta, idx.fused, idx.kmer_tbl, idx.dense_lo, idx.dense_hi,
        idx.count_arr, idx.sentinel, sym, lens, steps,
        use_stream=False, all_dense=facts[0], fixed_len=facts[1])

t0 = time.time()
lowered = jax.jit(ranges).lower(dev, patterns, lens_j)
t1 = time.time()
compiled = lowered.compile()
t2 = time.time()
log(f"lower {t1-t0:.1f}s compile {t2-t1:.1f}s")
out = compiled(dev, patterns, lens_j)
np.asarray(out[0])
t3 = time.time()
log(f"first exec {t3-t2:.1f}s")
out = compiled(dev, patterns, lens_j)
np.asarray(out[0])
log(f"second exec {time.time()-t3:.3f}s")
log("DONE")
