"""Streaming sort-join engine parity (ops/stream_join.py).

Runs the Pallas kernel in interpret mode on the CPU test mesh; the same code
compiles to Mosaic on a real TPU.  Oracles: the host FmIndex (reference
semantics, tested against the Rust crate's behavior elsewhere) and the
XLA-gather device path — the streaming path must be bit-identical to both.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sview_fmindex_tpu import (
    BLOCK3_U64,
    EncodingTable,
    FmIndex,
    FmIndexBuilder,
    LookupTableConfig,
    SuffixArrayConfig,
)
from sview_fmindex_tpu.ops import rank as rank_ops
from sview_fmindex_tpu.ops import stream_join


def _index(n=3000, sigma=4, seed=11, ratio=3):
    rng = np.random.default_rng(seed)
    alphabet = b"ACGT"[:sigma]
    text = rng.choice(np.frombuffer(alphabet, np.uint8), size=n).tobytes()
    enc = EncodingTable.from_symbols([bytes([b]) for b in alphabet])
    builder = FmIndexBuilder(
        len(text), enc.symbol_count(), enc, block=BLOCK3_U64,
        suffix_array_config=SuffixArrayConfig.compressed(ratio),
        lookup_table_config=LookupTableConfig.kmer_size(3),
        sa_backend="numpy",
    )
    fm = FmIndex.load(builder.build(text), block=BLOCK3_U64, encoder_kind="table")
    return fm, text, rng


def test_rank_primitives_match_xla_path():
    fm, text, rng = _index()
    # small stream tile so several tiles + chunk boundaries are exercised
    dev = fm.to_device(dense_lut_entries=0)
    meta = dev.meta
    small_meta = type(meta)(**{**meta.__dict__, "stream_tile": 256})
    bwt = stream_join.bwt_from_planes(
        np.ascontiguousarray(fm.lanes), fm.block.num_planes, fm.text_len)
    tbl = stream_join.build_stream_table(fm.symbol_count, bwt, 256)
    small_meta = type(meta)(**{**meta.__dict__, "stream_tile": 256,
                               "stream_rows": tbl.shape[0]})

    B = 700
    pos = rng.integers(0, fm.text_len, size=B).astype(np.uint32)
    sym = rng.integers(0, fm.symbol_count, size=B).astype(np.int32)

    want = rank_ops.rank_next(meta, dev.fused, dev.sentinel,
                              jnp.asarray(pos), jnp.asarray(sym))
    got = stream_join.rank_next_sorted(
        small_meta, jnp.asarray(tbl), dev.sentinel,
        jnp.asarray(pos), jnp.asarray(sym), T=256, C=1024)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    w_rank, w_sym, w_sent = rank_ops.pre_rank_and_symidx(
        meta, dev.fused, dev.sentinel, jnp.asarray(pos))
    g_rank, g_sym, g_sent = stream_join.pre_rank_and_symidx_sorted(
        small_meta, jnp.asarray(tbl), dev.sentinel, jnp.asarray(pos),
        T=256, C=1024)
    keep = ~np.asarray(w_sent)
    np.testing.assert_array_equal(np.asarray(g_sent), np.asarray(w_sent))
    np.testing.assert_array_equal(np.asarray(g_rank)[keep], np.asarray(w_rank)[keep])
    np.testing.assert_array_equal(np.asarray(g_sym)[keep], np.asarray(w_sym)[keep])


def test_count_and_locate_streaming_match_host():
    fm, text, rng = _index(n=2000, ratio=2)
    dev = fm.to_device(dense_lut_entries=0)

    B = 96
    pats, lens = [], []
    for i in range(B):
        plen = int(rng.integers(1, 14))
        s = int(rng.integers(0, len(text) - plen))
        pats.append(text[s : s + plen])
        lens.append(plen)
    Lmax = max(lens)
    batch = np.zeros((B, Lmax), np.uint8)
    for i, p in enumerate(pats):
        batch[i, : len(p)] = np.frombuffer(p, np.uint8)
    lens = np.asarray(lens, np.int32)

    counts = np.asarray(dev.count(batch, lens, use_stream=True))
    for i in range(B):
        assert counts[i] == fm.count(pats[i]), (i, pats[i])

    locs, pids, valid, _dropped = dev.locate(batch, lens, use_stream=True)
    locs, pids, valid = map(np.asarray, (locs, pids, valid))
    for i in range(B):
        mine = sorted(locs[valid & (pids == i)].tolist())
        assert mine == sorted(fm.locate(pats[i])), (i, pats[i])


def test_streaming_toggle_invariance():
    """use_stream is a pure execution-strategy toggle — results identical."""
    fm, text, rng = _index(n=1500, seed=5)
    dev = fm.to_device(dense_lut_entries=0)
    B = 64
    starts = rng.integers(0, len(text) - 8, size=B)
    batch = np.stack([np.frombuffer(text[s : s + 8], np.uint8) for s in starts])
    lens = np.full(B, 8, np.int32)

    c0 = np.asarray(dev.count(batch, lens, use_stream=False))
    c1 = np.asarray(dev.count(batch, lens, use_stream=True))
    np.testing.assert_array_equal(c0, c1)

    l0 = dev.locate(batch, lens, capacity=512, use_stream=False)
    l1 = dev.locate(batch, lens, capacity=512, use_stream=True)
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.tpu
def test_stream_kernel_compiled_on_tpu():
    """Mosaic-COMPILED kernel parity vs the gather engine (the default test
    run covers only interpret mode; this runs when SVIEW_TEST_TPU=1 and a
    real TPU is attached, and self-skips otherwise)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU attached")
    fm, text, rng = _index(n=60_000, seed=9)
    dev = fm.to_device(dense_lut_entries=0)
    B = 4096
    starts = rng.integers(0, len(text) - 12, size=B)
    batch = np.stack([np.frombuffer(text[s : s + 12], np.uint8) for s in starts])
    lens = np.full(B, 12, np.int32)

    c_gather = np.asarray(dev.count(batch, lens, use_stream=False))
    c_stream = np.asarray(dev.count(batch, lens, use_stream=True))
    np.testing.assert_array_equal(c_gather, c_stream)

    l0 = dev.locate(batch, lens, capacity=2 * B, use_stream=False)
    l1 = dev.locate(batch, lens, capacity=2 * B, use_stream=True)
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("plen", [9, 10, 11, 12, 16])
def test_sorted_chain_uniform_batches_match_host(plen):
    """The sorted-chain fast path (ops/search._ranges_chain): uniform-length
    batches with the pair engine pay ONE sort per pass + a final unsort.
    Must be bit-exact vs the host oracle and the gather engine across odd
    and even step counts (plen - seed parity) — including empty ranges
    (absent patterns), which the chain propagates WITHOUT active masks."""
    fm, text, rng = _index(n=2500, ratio=2)
    dev = fm.to_device(dense_lut_entries=0)  # seed = blob k=3
    assert dev.meta.pair_rows > 0

    B = 64
    starts = rng.integers(0, len(text) - plen, size=B)
    batch = np.frombuffer(text, np.uint8)[
        np.asarray(starts)[:, None] + np.arange(plen)].copy()
    # lane 3: a pattern that is absent (empty range mid-chain)
    batch[3] = np.frombuffer(b"T" * plen, np.uint8)
    # verify the gate engages the chain (uniform length, pair stream)
    from sview_fmindex_tpu.models.device_index import _as_batch

    _, _, steps, facts = _as_batch(dev.meta, batch, None)
    assert facts[1] == plen and steps >= 2

    counts = np.asarray(dev.count(batch, use_stream=True))
    counts_gather = np.asarray(dev.count(batch, use_stream=False,
                                         use_pair=False))
    assert (counts == counts_gather).all()
    for i in range(B):
        assert counts[i] == fm.count(batch[i].tobytes()), i

    locs, pids, valid, dropped = dev.locate(batch, use_stream=True)
    assert int(np.asarray(dropped)[0]) == 0
    locs, pids, valid = map(np.asarray, (locs, pids, valid))
    for i in range(B):
        mine = sorted(locs[valid & (pids == i)].tolist())
        assert mine == sorted(fm.locate(batch[i].tobytes())), i


def test_sorted_chain_with_dense_seed():
    """Chain under a dense seed (all_dense batches): seed column arithmetic
    must line up with the dense_k offset."""
    fm, text, rng = _index(n=4000, ratio=2)
    dev = fm.to_device(dense_lut_entries=1 << 20)
    if not dev.meta.dense_k:
        pytest.skip("no dense table at this text size")
    plen = dev.meta.dense_k + 5  # odd tail after the dense seed
    B = 48
    starts = rng.integers(0, len(text) - plen, size=B)
    batch = np.frombuffer(text, np.uint8)[
        np.asarray(starts)[:, None] + np.arange(plen)].copy()
    counts = np.asarray(dev.count(batch, use_stream=True))
    for i in range(B):
        assert counts[i] == fm.count(batch[i].tobytes()), i
    locs, pids, valid, dropped = dev.locate(batch, use_stream=True)
    assert int(np.asarray(dropped)[0]) == 0
    locs, pids, valid = map(np.asarray, (locs, pids, valid))
    for i in range(B):
        mine = sorted(locs[valid & (pids == i)].tolist())
        assert mine == sorted(fm.locate(batch[i].tobytes())), i
