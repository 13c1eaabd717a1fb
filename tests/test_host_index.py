"""Host FmIndex vs brute force: the differential-oracle tests.

Ports the reference test strategy (SURVEY.md §4):
- README example incl. wildcard semantics (``src/tests/readme/mod.rs``),
- random alphabet/text/pattern sweep over the type matrix
  (``src/tests/get_accurate_result/mod.rs``),
- config invariance (``src/tests/config_invariance/mod.rs``),
- encoder consistency: EncodingTable vs PassThrough
  (``src/tests/text_encoders_consistency/mod.rs``).
"""
import random

import numpy as np
import pytest

from sview_fmindex_tpu import (
    BlockKind,
    EncodingTable,
    FmIndex,
    FmIndexBuilder,
    LookupTableConfig,
    PassThrough,
    SuffixArrayConfig,
)

from oracle import brute_force_locate, gen_rand_pattern, gen_rand_symbols, gen_rand_text


def build_and_load(text, symbols, *, position="u32", block=BlockKind(2, 64),
                   sa_config=None, lut_config=None, wildcard=False):
    enc = (EncodingTable.from_symbols_with_wildcard(symbols) if wildcard
           else EncodingTable.from_symbols(symbols))
    builder = FmIndexBuilder(
        len(text), enc.symbol_count(), enc, position=position, block=block,
        suffix_array_config=sa_config, lookup_table_config=lut_config,
    )
    blob = builder.build(text)
    return FmIndex.load(blob, position=position, block=block, encoder_kind="table")


def test_readme_example():
    """The README example (tests/readme/mod.rs:1-47), exact values."""
    symbols = [b"Aa", b"Cc", b"Gg", b"Tt"]
    text = b"CTCCGTACACCTGTTTCGTATCGGAXXYYZZ"
    fm = build_and_load(text, symbols, block=BlockKind(2, 64))

    assert fm.count(b"TA") == 2
    assert sorted(fm.locate(b"TA")) == [5, 18]
    # last symbol (Tt) is the implicit wildcard: X/Y/Z/U all collapse to it
    assert sorted(fm.locate(b"UNDEF")) == [25, 26]
    assert sorted(fm.locate(b"XXXXX")) == [25, 26]
    assert sorted(fm.locate(b"!@#$%")) == [25, 26]


@pytest.mark.parametrize("position", ["u32", "u64"])
@pytest.mark.parametrize(
    "block",
    [BlockKind(p, v) for p in (2, 3, 4, 5, 6) for v in (32, 64, 128)],
    ids=lambda b: f"b{b.num_planes}v{b.vector_bits}",
)
def test_accurate_results_type_matrix(position, block):
    """Random texts/patterns vs brute force across the FULL type matrix —
    all 30 (P,B,V) instantiations like the reference's nested macros
    (get_accurate_result/mod.rs:96-139; k=3, sampling=2 fixed there).
    Set WIDE_TEST=1 for 2-62 symbol alphabets (mod.rs:60-76)."""
    import os

    # deterministic, combo-specific seed (no str hash: salted per process)
    seed = (block.num_planes * 1000 + block.vector_bits) * 2 + (position == "u64")
    rng = random.Random(seed)
    wide = os.environ.get("WIDE_TEST", "0") == "1"
    max_sym = min(block.max_symbol, 62 if wide else 17)
    n_text = 2
    n_pattern = 20
    for _ in range(n_text):
        sym_count = rng.randint(2, max_sym)
        symbols = gen_rand_symbols(rng, sym_count)
        text = gen_rand_text(rng, symbols, 100, 300)
        fm = build_and_load(
            text, symbols, position=position, block=block,
            sa_config=SuffixArrayConfig.compressed(2),
            lut_config=LookupTableConfig.kmer_size(3),
        )
        enc = fm.encoder
        text_sym = enc.encode(np.frombuffer(text, np.uint8))
        for _ in range(n_pattern):
            pattern = gen_rand_pattern(rng, text, 1, 10)
            pat_sym = enc.encode(np.frombuffer(pattern, np.uint8))
            expected = brute_force_locate(text_sym, pat_sym)
            assert fm.count(pattern) == len(expected)
            assert sorted(fm.locate(pattern)) == expected


def test_config_invariance():
    """Same answers across {LUT none,k=2,3,4} x {SA r=1,2,3,4}
    (config_invariance/mod.rs:50-144)."""
    rng = random.Random(42)
    symbols = gen_rand_symbols(rng, 4)
    text = gen_rand_text(rng, symbols, 150, 250)
    patterns = [gen_rand_pattern(rng, text, 1, 10) for _ in range(20)]

    baseline = build_and_load(text, symbols)
    base_answers = [(fmcount, sorted(fmloc)) for fmcount, fmloc in
                    ((baseline.count(p), baseline.locate(p)) for p in patterns)]

    lut_configs = [None, LookupTableConfig.kmer_size(2), LookupTableConfig.kmer_size(3),
                   LookupTableConfig.kmer_size(4)]
    sa_configs = [None, SuffixArrayConfig.compressed(2), SuffixArrayConfig.compressed(3),
                  SuffixArrayConfig.compressed(4)]
    for lut in lut_configs:
        for sa in sa_configs:
            fm = build_and_load(text, symbols, sa_config=sa, lut_config=lut)
            for p, (cnt, locs) in zip(patterns, base_answers):
                assert fm.count(p) == cnt
                assert sorted(fm.locate(p)) == locs


def test_encoder_consistency():
    """EncodingTable on raw text == PassThrough on pre-encoded indices,
    for both slice and rev-iter APIs (text_encoders_consistency/mod.rs:20-178)."""
    rng = random.Random(7)
    symbols = gen_rand_symbols(rng, 5)
    text = gen_rand_text(rng, symbols, 150, 250)
    enc = EncodingTable.from_symbols(symbols)
    text_sym = enc.encode(np.frombuffer(text, np.uint8))

    block = BlockKind(3, 64)
    fm_table = build_and_load(text, symbols, block=block,
                              sa_config=SuffixArrayConfig.compressed(2),
                              lut_config=LookupTableConfig.kmer_size(3))

    builder = FmIndexBuilder(
        len(text), enc.symbol_count(), PassThrough(), block=block,
        suffix_array_config=SuffixArrayConfig.compressed(2),
        lookup_table_config=LookupTableConfig.kmer_size(3),
    )
    blob = builder.build(text_sym)
    fm_pass = FmIndex.load(blob, block=block, encoder_kind="pass")

    for _ in range(30):
        pattern = gen_rand_pattern(rng, text, 1, 10)
        pat_sym = enc.encode(np.frombuffer(pattern, np.uint8))
        c = fm_table.count(pattern)
        assert c == fm_pass.count(pat_sym)
        assert c == fm_table.count_rev_iter(reversed(pattern))
        assert c == fm_pass.count_rev_iter(reversed(pat_sym.tolist()))
        locs = sorted(fm_table.locate(pattern))
        assert locs == sorted(fm_pass.locate(pat_sym))
        assert locs == sorted(fm_table.locate_rev_iter(reversed(pattern)))
        assert locs == sorted(fm_pass.locate_rev_iter(reversed(pat_sym.tolist())))


def test_pattern_shorter_than_kmer():
    """Short patterns use the LUT subtree range (count_array.rs:209-215)."""
    rng = random.Random(3)
    symbols = gen_rand_symbols(rng, 4)
    text = gen_rand_text(rng, symbols, 200, 300)
    fm = build_and_load(text, symbols, lut_config=LookupTableConfig.kmer_size(5),
                        sa_config=SuffixArrayConfig.compressed(3))
    enc = fm.encoder
    text_sym = enc.encode(np.frombuffer(text, np.uint8))
    for plen in (1, 2, 3, 4, 5, 6):
        for _ in range(10):
            pattern = gen_rand_pattern(rng, text, plen, plen)
            pat_sym = enc.encode(np.frombuffer(pattern, np.uint8))
            expected = brute_force_locate(text_sym, pat_sym)
            assert fm.count(pattern) == len(expected)
            assert sorted(fm.locate(pattern)) == expected


def test_max_memory_lut_config():
    """MaxMemory floor behavior (build_config/lookup_table_config.rs:55-77)."""
    assert LookupTableConfig.max_memory(0).resolved_kmer_size(1, "u32") == 1
    assert LookupTableConfig.max_memory(0).resolved_kmer_size(2, "u32") == 1
    # (4+1)^2 * 4 = 100 bytes
    assert LookupTableConfig.max_memory(100).resolved_kmer_size(4, "u32") == 2
    assert LookupTableConfig.max_memory(499).resolved_kmer_size(4, "u32") == 2
    assert LookupTableConfig.max_memory(500).resolved_kmer_size(4, "u32") == 3
