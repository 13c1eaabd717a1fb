"""Blob-format structural tests: layout, alignment, round-trip, mmap load."""
import random

import numpy as np
import pytest

from sview_fmindex_tpu import (
    BlockKind,
    EncodingTable,
    FmIndex,
    FmIndexBuilder,
    LoadError,
    LookupTableConfig,
    SuffixArrayConfig,
)
from sview_fmindex_tpu.blob import MAGIC, aligned_size

from oracle import gen_rand_symbols, gen_rand_text


def test_magic_and_versions():
    assert MAGIC == b"FI00\x00\x00\x00\x00"  # magic_number.rs:15-27


@pytest.mark.parametrize("block", [BlockKind(2, 32), BlockKind(2, 64), BlockKind(3, 128)])
@pytest.mark.parametrize("position", ["u32", "u64"])
def test_blob_size_matches_build(block, position):
    rng = random.Random(1)
    symbols = gen_rand_symbols(rng, 3)
    text = gen_rand_text(rng, symbols, 100, 200)
    enc = EncodingTable.from_symbols(symbols)
    builder = FmIndexBuilder(
        len(text), enc.symbol_count(), enc, position=position, block=block,
        suffix_array_config=SuffixArrayConfig.compressed(2),
        lookup_table_config=LookupTableConfig.kmer_size(2),
    )
    blob = builder.build(text)
    assert len(blob) == builder.blob_size()
    # every section boundary is aligned to the block's ALIGN_SIZE
    lay = builder.layout()
    for off in (lay.encoder_off, lay.ca_header_off, lay.sa_header_off,
                lay.bwm_header_off, lay.ca_body_off, lay.sa_body_off,
                lay.bwm_body_off, lay.blob_size):
        assert off % block.align_size == 0
    fm = FmIndex.load(blob, position=position, block=block, encoder_kind="table")
    assert fm.text_len == len(text)


def test_load_rejects_bad_magic_and_size():
    rng = random.Random(2)
    symbols = gen_rand_symbols(rng, 3)
    text = gen_rand_text(rng, symbols, 100, 150)
    enc = EncodingTable.from_symbols(symbols)
    builder = FmIndexBuilder(len(text), enc.symbol_count(), enc, block=BlockKind(2, 64))
    blob = bytearray(builder.build(text))
    ok = FmIndex.load(bytes(blob), block=BlockKind(2, 64))
    assert ok.count(text[:5]) >= 1

    bad = bytearray(blob)
    bad[0] = ord("X")
    with pytest.raises(LoadError):
        FmIndex.load(bytes(bad), block=BlockKind(2, 64))
    with pytest.raises(LoadError):
        FmIndex.load(bytes(blob) + b"\x00" * 8, block=BlockKind(2, 64))


def test_blob_roundtrip_via_file_and_memmap(tmp_path):
    """Save blob = checkpoint; load via np.memmap = the mmap path."""
    rng = random.Random(3)
    symbols = gen_rand_symbols(rng, 4)
    text = gen_rand_text(rng, symbols, 200, 300)
    enc = EncodingTable.from_symbols(symbols)
    builder = FmIndexBuilder(
        len(text), enc.symbol_count(), enc, block=BlockKind(2, 64),
        suffix_array_config=SuffixArrayConfig.compressed(2),
    )
    blob = builder.build(text)
    path = tmp_path / "index.blob"
    path.write_bytes(blob)

    mm = np.memmap(path, dtype=np.uint8, mode="r")
    fm = FmIndex.load(mm, block=BlockKind(2, 64))
    fm2 = FmIndex.load(blob, block=BlockKind(2, 64))
    for _ in range(10):
        start = rng.randint(0, len(text) - 5)
        pattern = text[start : start + 5]
        assert fm.count(pattern) == fm2.count(pattern)
        assert sorted(fm.locate(pattern)) == sorted(fm2.locate(pattern))


def test_build_into_provided_buffer():
    """Caller-allocated blob (the reference's build-into-mmap path)."""
    rng = random.Random(4)
    symbols = gen_rand_symbols(rng, 3)
    text = gen_rand_text(rng, symbols, 100, 150)
    enc = EncodingTable.from_symbols(symbols)
    builder = FmIndexBuilder(len(text), enc.symbol_count(), enc, block=BlockKind(2, 64))
    buf = bytearray(builder.blob_size())
    builder.build(text, buf)
    assert bytes(buf) == builder.build(text)


def test_alignment_math():
    assert aligned_size(0, 8) == 0
    assert aligned_size(1, 8) == 8
    assert aligned_size(8, 8) == 8
    assert aligned_size(24, 16) == 32
