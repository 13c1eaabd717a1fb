"""2-step pair-table engine (build/pair_table.py + ops/search.py).

The pair engine consumes two pattern symbols per stream pass.  Its device
table is built from the fused table alone; results must be bit-identical
to the single-step gather engine and the host oracle, including the
sentinel-target correction entry, odd/even leftover-step masking, and
mixed pattern lengths.
"""
import numpy as np
import pytest

import sview_fmindex_tpu as fmx


def _index(text, block=None, k=3, r=2, dense=0):
    block = block or fmx.BLOCK3_U64
    enc = fmx.EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
    b = fmx.FmIndexBuilder(
        len(text), enc.symbol_count(), enc, position="u32", block=block,
        suffix_array_config=fmx.SuffixArrayConfig.compressed(r),
        lookup_table_config=fmx.LookupTableConfig.kmer_size(k))
    blob = b.build(text)
    fm = fmx.FmIndex.load(np.frombuffer(blob, np.uint8), position="u32",
                          block=block, encoder_kind="table")
    return fm, fm.to_device(dense_lut_entries=dense)


@pytest.mark.parametrize("n,plen,dense", [
    (3001, 12, 4 ** 5),  # dense seed -> even rem
    (777, 9, 0),         # blob k=3 seed -> mixed odd rem
    (100, 5, 0),         # tiny: sentinel-heavy
])
def test_pair_engine_matches_gather_and_oracle(n, plen, dense):
    rng = np.random.default_rng(n)
    text = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
    fm, dev = _index(text, dense=dense)
    assert dev.meta.pair_rows > 0
    starts = rng.integers(0, n - plen, size=64)
    pats = np.frombuffer(text, np.uint8)[starts[:, None] + np.arange(plen)]
    lens = rng.integers(1, plen + 1, size=64).astype(np.int32)
    c_pair = np.asarray(dev.count(pats, lens, use_stream=True))
    c_gather = np.asarray(dev.count(pats, lens, use_stream=False))
    np.testing.assert_array_equal(c_pair, c_gather)
    for i in range(64):
        assert c_pair[i] == fm.count(pats[i, : lens[i]].tobytes()), i


def test_pair_locate_parity():
    rng = np.random.default_rng(7)
    n = 2048
    text = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
    fm, dev = _index(text)
    starts = rng.integers(0, n - 10, size=32)
    pats = np.frombuffer(text, np.uint8)[starts[:, None] + np.arange(10)]
    lens = np.full(32, 10, np.int32)
    l0 = dev.locate(pats, lens, capacity=256, use_stream=False)
    l1 = dev.locate(pats, lens, capacity=256, use_stream=True)
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pair_disabled_still_works():
    rng = np.random.default_rng(9)
    n = 600
    text = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
    enc = fmx.EncodingTable.from_symbols([b"A", b"C", b"G", b"T"])
    b = fmx.FmIndexBuilder(
        n, enc.symbol_count(), enc, position="u32", block=fmx.BLOCK3_U64,
        suffix_array_config=fmx.SuffixArrayConfig.compressed(2),
        lookup_table_config=fmx.LookupTableConfig.kmer_size(3))
    fm = fmx.FmIndex.load(np.frombuffer(b.build(text), np.uint8),
                          position="u32", block=fmx.BLOCK3_U64,
                          encoder_kind="table")
    dev = fm.to_device(pair=False, dense_lut_entries=0)
    assert dev.meta.pair_rows == 0
    pats = np.frombuffer(text[:8], np.uint8)[None, :]
    c = np.asarray(dev.count(pats, np.array([8], np.int32), use_stream=True))
    assert int(c[0]) == fm.count(text[:8])


def test_pair_gather_layout_opt_in():
    """The gather-layout pair table (opt-in): the non-stream engine
    consumes two symbols per row gather; parity vs the single-symbol
    engine and the oracle."""
    from sview_fmindex_tpu.models.device_index import DeviceFmIndex

    rng = np.random.default_rng(5)
    n = 1200
    text = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
    fm, _ = _index(text)
    dev = DeviceFmIndex.from_host(fm, pair_gather=True, dense_lut_entries=0)
    assert dev.meta.pair_gather
    starts = rng.integers(0, n - 10, size=32)
    pats = np.frombuffer(text, np.uint8)[starts[:, None] + np.arange(10)]
    lens = np.full(32, 10, np.int32)
    c0 = np.asarray(dev.count(pats, lens, use_stream=False))
    c1 = np.asarray(dev.count(pats, lens, use_stream=False, use_pair=False))
    np.testing.assert_array_equal(c0, c1)
    for i in range(32):
        assert c0[i] == fm.count(pats[i].tobytes())
