"""Headline benchmark: locate queries/sec/chip on the README benchmark config.

Mirrors the reference's methodology (``bench/run_benchmark.sh``, README
tables, BASELINE.md): 1 Gbp random nucleotide text (seed 42), 20 bp patterns
extracted from the text, cold=100% (all unique), index = u32 positions /
Block3<u64> / SA sampling 2 / k-mer LUT 3.

Baseline anchor (BASELINE.md): ~2.3e5 locate/s single Xeon core, in-memory.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Engine selection: the streaming sort-join engine (``ops.stream_join``) serves
the timed runs; before the result is printed the same full batch runs through
the XLA-gather engine and both are asserted equal (the TPU-side parity gate
— the bench aborts on any mismatch).

Env knobs:
  BENCH_TEXT_SIZE      text length (default 1e9)
  BENCH_PATTERN_COUNT  number of 20 bp patterns (default 100_000)
  BENCH_CACHE_DIR      blob cache dir (default ./bench_cache)
  BENCH_PARITY=0       skip the gather-engine parity gate (debug only)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TEXT_SIZE = int(float(os.environ.get("BENCH_TEXT_SIZE", "1e9")))
PATTERN_COUNT = int(float(os.environ.get("BENCH_PATTERN_COUNT", "1e5")))
PATTERN_LEN = 20
SEED = 42
BASELINE_LOCATE_QPS = 2.3e5  # BASELINE.md derived anchor

CACHE_DIR = os.environ.get("BENCH_CACHE_DIR", os.path.join(os.path.dirname(__file__), "bench_cache"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def get_text() -> bytes:
    path = os.path.join(CACHE_DIR, f"text_{TEXT_SIZE}_{SEED}.bin")
    if os.path.exists(path):
        return np.fromfile(path, dtype=np.uint8).tobytes()
    rng = np.random.default_rng(SEED)
    # bit-identical to rng.choice(ACGT, size=...) but ~2x faster at Gbp scale
    text = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, size=TEXT_SIZE)]
    os.makedirs(CACHE_DIR, exist_ok=True)
    text.tofile(path)
    return text.tobytes()


def sa_full_path() -> str:
    return os.path.join(CACHE_DIR, f"sa_full_{TEXT_SIZE}_{SEED}.u32")


def get_blob(text: bytes):
    from sview_fmindex_tpu import (
        BLOCK3_U64,
        EncodingTable,
        FmIndex,
        FmIndexBuilder,
        LookupTableConfig,
        SuffixArrayConfig,
    )

    path = os.path.join(CACHE_DIR, f"index_{TEXT_SIZE}_{SEED}_b3u64_r2_k3.blob")
    if not os.path.exists(path):
        enc = EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
        builder = FmIndexBuilder(
            len(text), enc.symbol_count(), enc, position="u32", block=BLOCK3_U64,
            suffix_array_config=SuffixArrayConfig.compressed(2),
            lookup_table_config=LookupTableConfig.kmer_size(3),
        )
        t0 = time.time()
        os.makedirs(CACHE_DIR, exist_ok=True)
        blob = builder.build(text, sa_full_path=sa_full_path())
        log(f"[bench] built index for {TEXT_SIZE} bp in {time.time()-t0:.1f}s "
            f"({len(blob)/2**20:.0f} MiB); caching")
        with open(path, "wb") as f:
            f.write(blob)
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    return FmIndex.load(mm, position="u32", block=BLOCK3_U64, encoder_kind="table")


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the driver re-runs this on fresh processes
    cache_dir = os.path.join(CACHE_DIR, "xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    log(f"[bench] devices: {jax.devices()}")
    text = get_text()
    t0 = time.time()
    fm = get_blob(text)
    log(f"[bench] blob load: {time.time()-t0:.2f}s")

    t0 = time.time()
    lut_cache = os.path.join(CACHE_DIR, f"dense_lut_{TEXT_SIZE}_{SEED}.npz")
    sa_full = sa_full_path() if os.path.exists(sa_full_path()) else None
    dev = fm.to_device(dense_lut_entries=1 << 26, dense_lut_cache=lut_cache,
                       sa_full=sa_full)
    upload_s = time.time() - t0
    log(f"[bench] device upload (dense_k={dev.meta.dense_k}, "
        f"sa_full={dev.meta.has_sa_full}): {upload_s:.2f}s")

    # the axon runtime pays a large one-time cost in the first executable
    # that contains XLA gathers (~30 s per distinct gather op in it);
    # front-load it with a single-gather dummy program.
    t0 = time.time()
    _d = jnp.asarray(np.arange(1024, dtype=np.uint32))
    _i = jnp.asarray(np.arange(256, dtype=np.int32))
    float(jax.jit(lambda t, i: jnp.take(t, i).sum())(_d, _i))
    log(f"[bench] gather prewarm: {time.time()-t0:.1f}s")

    rng = np.random.default_rng(SEED + 1)
    starts = rng.integers(0, TEXT_SIZE - PATTERN_LEN, size=PATTERN_COUNT)
    text_arr = np.frombuffer(text, np.uint8)
    patterns_np = text_arr[starts[:, None] + np.arange(PATTERN_LEN)]
    # pre-upload the batch: we time the chip, not the host->device link
    patterns = jnp.asarray(patterns_np)
    lens = np.full(PATTERN_COUNT, PATTERN_LEN, dtype=np.int32)

    # ---- count-only throughput (the ranges executable IS count) ----
    t0 = time.time()
    counts = np.asarray(dev.count(patterns, lens, use_stream=True))
    count_warmup = time.time() - t0
    log(f"[bench] count warmup: {count_warmup:.1f}s")
    assert (counts >= 1).all()
    # pipelined steady-state: enqueue all reps, then force every result —
    # the device overlaps independent batches, the final materializations
    # keep the timing honest (block_until_ready acks early on this backend)
    reps = 4
    t0 = time.time()
    results = [dev.count(patterns, lens, use_stream=True) for _ in range(reps)]
    for c in results:
        float(c.sum())
    count_qps = reps * PATTERN_COUNT / (time.time() - t0)
    log(f"[bench] count-only: {count_qps/1e6:.3f} Mq/s")

    # ---- locate throughput: ONE executable (search+expand+resolve) ----
    total = int(counts.sum())
    capacity = max(1 << (total - 1).bit_length(), 1024)
    t0 = time.time()
    locs, pids, valid, c2 = dev.locate_with_counts(
        patterns, lens, capacity=capacity, use_stream=True)
    locs.block_until_ready()
    locate_warmup = time.time() - t0
    log(f"[bench] locate warmup: {locate_warmup:.1f}s")
    t0 = time.time()
    outs = [dev.locate_with_counts(patterns, lens, capacity=capacity, use_stream=True)
            for _ in range(reps)]
    for locs, pids, valid, c2 in outs:
        float(locs.max())  # force full execution + round-trip
    locate_qps = reps * PATTERN_COUNT / (time.time() - t0)
    log(f"[bench] locate: {locate_qps/1e6:.3f} Mq/s ({total} hits, capacity {capacity})")
    locs, pids, valid, c2 = outs[-1]

    locs_np, pids_np, valid_np = map(np.asarray, (locs, pids, valid))
    # text-level correctness: every reported location matches its pattern
    idx = np.nonzero(valid_np)[0][:200]
    for i in idx:
        l, p = int(locs_np[i]), int(pids_np[i])
        assert bytes(text_arr[l : l + PATTERN_LEN]) == bytes(patterns_np[p]), (l, p)

    # ---- TPU-side parity gate: full batch, stream vs gather engines ----
    if os.environ.get("BENCH_PARITY", "1") != "0":
        t0 = time.time()
        c_g = np.asarray(dev.count(patterns, lens, use_stream=False))
        assert (c_g == counts).all(), "count parity FAILED (stream vs gather)"
        lg, pg, vg, cg2 = dev.locate_with_counts(
            patterns, lens, capacity=capacity, use_stream=False)
        lg, pg, vg = map(np.asarray, (lg, pg, vg))
        assert (vg == valid_np).all() and (lg[vg] == locs_np[valid_np]).all() \
            and (pg[vg] == pids_np[valid_np]).all(), \
            "locate parity FAILED (stream vs gather)"
        log(f"[bench] parity gate (full batch, both engines): OK "
            f"({time.time()-t0:.1f}s)")

    print(json.dumps({
        "metric": "locate_queries_per_sec_per_chip",
        "value": round(locate_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(locate_qps / BASELINE_LOCATE_QPS, 2),
        "count_qps": round(count_qps, 1),
        "text_size": TEXT_SIZE,
        "pattern_count": PATTERN_COUNT,
        "warmup_s": {"upload": round(upload_s, 1),
                     "count": round(count_warmup, 1),
                     "locate": round(locate_warmup, 1)},
    }))


if __name__ == "__main__":
    main()
