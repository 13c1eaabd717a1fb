"""Scaling evidence for the pattern-DP layer (BASELINE north star:
>= 80% efficiency 1 chip -> 2 hosts).

Three parts, each honest about what it can and cannot show on this
machine (one tunneled TPU chip, no multi-chip hardware):

1. **Weak scaling on the virtual CPU mesh** (constant per-device batch).
   The virtual devices SHARE this host's physical cores, so compute time
   necessarily grows with the device count once the work exceeds the
   cores — the curve measures host contention, not ICI.  The artifact
   records cores vs devices so the number can't be misread as a chip
   scaling result (the round-3 artifact was, hence this framing).
2. **shard_map overhead at mesh size 1 on the real backend**: the sharded
   step vs the plain single-device step, same batch — isolates the
   wrapper + collective machinery cost with zero actual communication.
3. **Comm-cost model for the 2-host target**: the hot path is
   zero-communication (the index is replicated; each shard searches
   locally).  The ONLY collective is the result concatenation at the
   ``out_specs`` boundary — an all-gather of counts (4 B/pattern) or
   locate triples (~9 B/slot).  The model quantifies those bytes against
   DCN/ICI bandwidth and the measured per-batch compute time.

Writes SCALING_r04.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def weak_scaling(text_size: int = 2_000_000, per_shard: int = 25_000):
    import jax

    import sview_fmindex_tpu as fmx
    from sview_fmindex_tpu.parallel.mesh import make_mesh
    from sview_fmindex_tpu.parallel.query import ShardedFmIndex

    rng = np.random.default_rng(1)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=text_size).tobytes()
    enc = fmx.EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
    b = fmx.FmIndexBuilder(
        len(text), enc.symbol_count(), enc, position="u32",
        block=fmx.BLOCK3_U64,
        suffix_array_config=fmx.SuffixArrayConfig.compressed(2),
        lookup_table_config=fmx.LookupTableConfig.kmer_size(3))
    fm = fmx.FmIndex.load(np.frombuffer(b.build(text), np.uint8),
                          position="u32", block=fmx.BLOCK3_U64,
                          encoder_kind="table")
    dev = fm.to_device(dense_lut_entries=0, stream=False, pair=False)
    t_arr = np.frombuffer(text, np.uint8)

    def batch(B, seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, text_size - 20, size=B)
        return t_arr[starts[:, None] + np.arange(20)], np.full(B, 20, np.int32)

    rows = []
    n_all = len(jax.devices())
    for n_dev in (1, 2, 4, 8):
        if n_dev > n_all:
            break
        sharded = ShardedFmIndex(dev, make_mesh(n_devices=n_dev))
        B = per_shard * n_dev
        pats, lens = batch(B, 100 + n_dev)
        np.asarray(sharded.count(pats, lens))  # warm/compile
        reps = 6
        t0 = time.time()
        outs = [sharded.count(pats, lens) for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        dt = (time.time() - t0) / reps
        rows.append({"devices": n_dev, "batch": B, "s_per_batch": round(dt, 4),
                     "qps": round(B / dt, 1)})
        print(f"[scaling] {n_dev} dev x {per_shard}/shard: {dt*1e3:.1f} ms "
              f"({B/dt/1e6:.2f} Mq/s)", flush=True)
    base = rows[0]["s_per_batch"]
    for r in rows:
        r["weak_efficiency"] = round(base / r["s_per_batch"], 3)
    return rows


def shard_map_overhead_real_backend(text_size: int = 10_000_000,
                                    B: int = 100_000):
    """Sharded step on a 1-device mesh vs the plain step, real backend."""
    import jax

    import sview_fmindex_tpu as fmx
    from sview_fmindex_tpu.parallel.mesh import make_mesh
    from sview_fmindex_tpu.parallel.query import ShardedFmIndex

    rng = np.random.default_rng(3)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=text_size).tobytes()
    enc = fmx.EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
    b = fmx.FmIndexBuilder(
        len(text), enc.symbol_count(), enc, position="u32",
        block=fmx.BLOCK3_U64,
        suffix_array_config=fmx.SuffixArrayConfig.compressed(2),
        lookup_table_config=fmx.LookupTableConfig.kmer_size(3))
    fm = fmx.FmIndex.load(np.frombuffer(b.build(text), np.uint8),
                          position="u32", block=fmx.BLOCK3_U64,
                          encoder_kind="table")
    dev = fm.to_device(dense_lut_entries=0, derived_cache_dir=None)
    t_arr = np.frombuffer(text, np.uint8)
    starts = rng.integers(0, text_size - 20, size=B)
    pats = t_arr[starts[:, None] + np.arange(20)]
    lens = np.full(B, 20, np.int32)
    sharded = ShardedFmIndex(dev, make_mesh(n_devices=1))

    # interleave plain/sharded windows so slow chip drift (tunnel-daemon
    # interference, DESIGN.md) cancels instead of landing on one side;
    # report per-method MEDIAN of the windows
    def window(f, reps=6):
        t0 = time.time()
        outs = [f() for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        return (time.time() - t0) / reps

    f_plain = lambda: dev.count(pats, lens)
    f_shmap = lambda: sharded.count(pats, lens)
    np.asarray(f_plain())
    np.asarray(f_shmap())
    pw, sw = [], []
    for _ in range(5):
        pw.append(window(f_plain))
        sw.append(window(f_shmap))
    plain = float(np.median(pw))
    shmap = float(np.median(sw))
    print(f"[scaling] mesh-1 shard_map {shmap*1e3:.1f} ms vs plain "
          f"{plain*1e3:.1f} ms", flush=True)
    return {"plain_s": round(plain, 4), "shard_map_s": round(shmap, 4),
            "overhead_frac": round(shmap / plain - 1, 3)}


def comm_model(B: int = 1_000_000, per_batch_s: float = 0.165):
    """Bytes crossing the out_specs all-gather per batch vs link speeds.

    ``per_batch_s``: driver-captured B=1M locate time on the v5e
    (BENCH_r04: 6.06 Mq/s).  The model is anchored by a MEASURED
    inter-process collective: ``tools/multihost_dryrun.py`` times the
    result all-gather across its real 2-process boundary (gRPC over
    localhost) at these exact payload sizes; that measurement is folded
    in by :func:`measured_collective` below.
    """
    count_bytes = 4 * B
    locate_bytes = (4 + 4 + 1) * int(B * 1.01)  # locs + pids + valid
    ici = 4.5e10  # ~45 GB/s per v5e ICI direction (public spec order)
    dcn = 2.5e10  # ~25 GB/s host NIC order
    return {
        "assumption": "index replicated per chip; hot path has ZERO "
                      "communication; the only collective is the result "
                      "all-gather at out_specs",
        "batch": B,
        "count_allgather_bytes": count_bytes,
        "locate_allgather_bytes": locate_bytes,
        "count_allgather_s_ici": round(count_bytes / ici, 6),
        "locate_allgather_s_dcn": round(locate_bytes / dcn, 6),
        "measured_compute_s_per_batch": per_batch_s,
        "predicted_2host_efficiency": round(
            per_batch_s / (per_batch_s + locate_bytes / dcn), 4),
    }


def measured_collective(per_batch_s: float = 0.165):
    """Fold the dryrun's MEASURED cross-process all-gather into the model.

    Reads MULTIHOST_r05.json (written by ``tools/multihost_dryrun.py``).
    The localhost-gRPC transport is far SLOWER than any real DCN NIC, so
    the efficiency computed with it is a floor: 2-host efficiency on real
    hardware lies between this measured floor and the spec-based
    prediction.
    """
    path = os.path.join(os.path.dirname(__file__), "..", "MULTIHOST_r05.json")
    if not os.path.exists(path):
        return {"note": "run tools/multihost_dryrun.py first"}
    with open(path) as f:
        mh = json.load(f)
    if not mh.get("ok") or not mh.get("procs"):
        return {"note": "dryrun artifact not ok"}
    c = mh["procs"][0]["collective"]
    locate_s = c["locate_1m"]["mean_s"]
    return {
        "source": "MULTIHOST_r05.json (2-process dryrun, all-gather at "
                  "out_specs over the real process boundary)",
        "transport": mh["procs"][0].get("transport", "grpc-localhost"),
        "locate_allgather_payload_bytes": c["locate_1m"]["payload_bytes"],
        "locate_allgather_measured_s": locate_s,
        "count_allgather_measured_s": c["count_1m"]["mean_s"],
        "effective_cross_GBps": c["locate_1m"]["effective_cross_GBps"],
        "efficiency_floor_with_measured_transport": round(
            per_batch_s / (per_batch_s + locate_s), 4),
        "note": "localhost gRPC is slower than any real DCN NIC; real "
                "2-host efficiency lies between this measured floor and "
                "predicted_2host_efficiency",
    }


def main() -> None:
    import jax

    out = {
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "host_cores": os.cpu_count(),
        "virtual_mesh_note": (
            "virtual devices share this host's physical cores "
            f"({os.cpu_count()}); weak-scaling beyond that core count "
            "measures host contention, not interconnect — it cannot show "
            "the >= 0.8 target and is recorded only for the collective-"
            "correctness surface it exercises"),
        "weak_scaling": weak_scaling(),
        "comm_model": comm_model(),
        "measured_collective": measured_collective(),
    }
    if jax.default_backend() == "tpu":
        out["shard_map_overhead_mesh1"] = shard_map_overhead_real_backend()
    with open("SCALING_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("weak_scaling",)}))


if __name__ == "__main__":
    main()
