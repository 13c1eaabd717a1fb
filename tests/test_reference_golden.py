"""Golden blob-format fixtures: byte-exact layout lock vs the reference spec.

No Rust toolchain exists in this image, so the oracle is an INDEPENDENT blob
synthesizer written here from the reference source, field by field:

- write order + alignment: ``builder/mod.rs:211-262``, ``components/mod.rs:1-23``
- magic: ``magic_number.rs:15-27``
- CountArray body (count array, kmer multiplier, kmer table, reverse rolling
  pass, prefix sums): ``count_array.rs:58-145``
- SA/BWT conventions (sentinel append, pidx, SA[0] removal, step_by sampling):
  ``crate_bio_manual/mod.rs:8-32`` — realized here with a naive
  sort-of-suffixes (independent of the repo's SA-IS/C++ backends)
- BWM body (sentinel index, per-block checkpoint snapshots, plane shift-in
  vectorize, last-offset shift / zero-fill): ``bwm/mod.rs:91-143``,
  ``blocks/block2.rs:18-33``

The synthesizer shares NO code with ``sview_fmindex_tpu`` (plain ints +
struct), so agreement means both independently implement the documented
layout.  SHA-256 digests of two fixed blobs are frozen on top: if builder and
synthesizer ever drift together, the digest still fails.
"""
import hashlib
import random
import struct

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

from oracle import gen_rand_symbols, gen_rand_text


# ---------------------------------------------------------------------------
# independent synthesizer
# ---------------------------------------------------------------------------

def _align(n: int, a: int) -> int:
    return n if n % a == 0 else n + (a - n % a)


def synth_blob(text: bytes, enc_table: list[int] | None, sigma: int, k: int,
               r: int, psize: int, planes: int, vbits: int) -> bytes:
    """Reference-layout blob, built naively.  ``enc_table``: 256-entry byte ->
    symidx map (None = PassThrough: text already holds symbol indices)."""
    vbytes = vbits // 8
    align = 16 if vbits == 128 else 8  # Vector::ALIGN_SIZE (vector.rs:35-79)
    L = vbits  # BLOCK_LEN == vector bit width
    n = len(text)

    def P(v: int) -> bytes:
        return v.to_bytes(psize, "little")

    # -- encode text to symidx, then to symidx+1 (count_array.rs:112-116)
    sym = [int(enc_table[b]) if enc_table is not None else int(b) for b in text]
    enc1 = [s + 1 for s in sym]

    # -- count array + kmer table (reverse rolling pass, count_array.rs:111-126)
    base = sigma + 1
    count_array = [0] * (sigma + 1)
    kmer_tbl = [0] * (base ** k)
    kmer_multiplier = [base ** p for p in reversed(range(k))]
    table_index = 0
    for s in reversed(sym):
        count_array[s + 1] += 1
        table_index = table_index // base + (s + 1) * kmer_multiplier[0]
        kmer_tbl[table_index] += 1
    for arr in (count_array, kmer_tbl):
        acc = 0
        for i, v in enumerate(arr):
            acc += v
            arr[i] = acc

    # -- SA + BWT via naive suffix sort (crate_bio_manual/mod.rs:8-32)
    with_sent = enc1 + [0]
    sa_full = sorted(range(n + 1), key=lambda i: with_sent[i:])
    bwt = [with_sent[i - 1] if i > 0 else 0 for i in sa_full]
    pidx = bwt.index(0)
    del bwt[pidx]
    del sa_full[0]
    sampled_sa = sa_full[::r]

    # -- BWM: checkpoints + plane-vectorized blocks (bwm/mod.rs:91-143)
    n_blocks = n // L + 1
    running = [0] * sigma
    ckpts: list[list[int]] = []
    blocks: list[list[int]] = []  # per block: planes vectors
    for b0 in range(0, n, L):
        chunk = bwt[b0 : b0 + L]
        ckpts.append(list(running))
        vecs = [0] * planes
        for c in chunk:
            s = c - 1
            running[s] += 1
            for j in range(planes):
                vecs[j] = ((vecs[j] << 1) | ((s >> j) & 1)) & ((1 << vbits) - 1)
        if len(chunk) < L:  # shift_last_offset (bwm/mod.rs:140-142)
            off = L - len(chunk)
            vecs = [(v << off) & ((1 << vbits) - 1) for v in vecs]
        blocks.append(vecs)
    if n % L == 0:
        ckpts.append(list(running))
        blocks.append([0] * planes)
    assert len(blocks) == n_blocks

    # -- assemble (builder/mod.rs:211-262)
    out = bytearray()

    def put(raw: bytes):
        out.extend(raw)
        out.extend(b"\x00" * (_align(len(raw), align) - len(raw)))

    put(b"FI00\x00\x00\x00\x00")
    if enc_table is not None:
        put(bytes(enc_table))
    put(struct.pack("<IIIIQ", sigma, k, sigma + 1, k, base ** k))
    sa_len = -(-n // r)
    put(struct.pack("<IIQ", r, 0, sa_len))
    put(struct.pack("<IIQQ", sigma, 0, n_blocks * sigma, n_blocks))

    put(b"".join(P(v) for v in count_array))
    put(b"".join(m.to_bytes(8, "little") for m in kmer_multiplier))
    put(b"".join(P(v) for v in kmer_tbl))
    assert len(sampled_sa) == sa_len
    put(b"".join(P(v) for v in sampled_sa))
    put(P(pidx))
    put(b"".join(P(v) for row in ckpts for v in row))
    put(b"".join(v.to_bytes(vbytes, "little") for vecs in blocks for v in vecs))
    return bytes(out)


def build_blob(text: bytes, symbols, *, position, block, k, r, passthrough=False):
    if passthrough:
        enc = PassThrough()
        sigma = len(symbols)
    else:
        enc = EncodingTable.from_symbols(symbols)
        sigma = enc.symbol_count()
    builder = FmIndexBuilder(
        len(text), sigma, enc, position=position, block=block,
        suffix_array_config=SuffixArrayConfig.compressed(r) if r > 1 else None,
        lookup_table_config=LookupTableConfig.kmer_size(k) if k > 1 else None,
    )
    return builder.build(text)


CASES = [
    ("u32", BlockKind(2, 64), 3, 2),
    ("u64", BlockKind(2, 64), 3, 2),
    ("u32", BlockKind(3, 32), 2, 1),
    ("u32", BlockKind(3, 64), 3, 2),
    ("u64", BlockKind(4, 128), 4, 3),
    ("u32", BlockKind(6, 64), 2, 4),
]


@pytest.mark.parametrize("position,block,k,r", CASES,
                         ids=lambda v: str(v) if not isinstance(v, BlockKind)
                         else f"b{v.num_planes}v{v.vector_bits}")
def test_blob_bytes_match_independent_synth(position, block, k, r):
    rng = random.Random(1000 * block.num_planes + block.vector_bits + k + r)
    for trial in range(3):
        sym_count = rng.randint(2, min(block.max_symbol, 17))
        symbols = gen_rand_symbols(rng, sym_count)
        text = gen_rand_text(rng, symbols, 50, 200)
        blob = build_blob(text, symbols, position=position, block=block, k=k, r=r)

        enc = EncodingTable.from_symbols(symbols)
        golden = synth_blob(
            text, list(enc.table), enc.symbol_count(), k, r,
            4 if position == "u32" else 8, block.num_planes, block.vector_bits,
        )
        assert bytes(blob) == golden, (position, block, k, r, trial)


def test_blob_bytes_passthrough():
    rng = random.Random(99)
    sigma = 5
    text = bytes(rng.randrange(sigma) for _ in range(173))
    block = BlockKind(3, 64)
    blob = build_blob(text, list(range(sigma)), position="u32", block=block,
                      k=3, r=2, passthrough=True)
    golden = synth_blob(text, None, sigma, 3, 2, 4, 3, 64)
    assert bytes(blob) == golden


# frozen digests: catch correlated drift of builder AND synthesizer
README_TEXT = b"CTCCGTACACCTGTTTCGTATCGGAXXYYZZ"
README_SYMBOLS = [b"Aa", b"Cc", b"Gg", b"Tt"]


def test_frozen_digest_readme_blob():
    blob = build_blob(README_TEXT, README_SYMBOLS, position="u32",
                      block=BlockKind(2, 64), k=2, r=2)
    enc = EncodingTable.from_symbols(README_SYMBOLS)
    golden = synth_blob(README_TEXT, list(enc.table), 4, 2, 2, 4, 2, 64)
    assert bytes(blob) == golden
    assert hashlib.sha256(bytes(blob)).hexdigest() == (
        "feacd7aa1aed69fcb867e4a82bef1e3bf0426b75db9fdd59f12eafb9a8df1f7b"
    )


def test_frozen_digest_block3_u64():
    rng = random.Random(4242)
    symbols = [b"A", b"C", b"G", b"T", b"N"]
    text = gen_rand_text(rng, symbols, 300, 300)
    blob = build_blob(text, symbols, position="u32", block=BlockKind(3, 64),
                      k=3, r=2)
    enc = EncodingTable.from_symbols(symbols)
    golden = synth_blob(text, list(enc.table), 5, 3, 2, 4, 3, 64)
    assert bytes(blob) == golden
    assert hashlib.sha256(bytes(blob)).hexdigest() == (
        "6abb0cc1f26bd90f5d0fcf04695ed6a1551f788f88b0557f581622c1f29e2aee"
    )


def test_golden_queries_readme():
    """count/sorted-locate goldens for the README example — the values the
    reference test pins (tests/readme/mod.rs:30-44)."""
    blob = build_blob(README_TEXT, README_SYMBOLS, position="u32",
                      block=BlockKind(2, 64), k=2, r=2)
    fm = FmIndex.load(blob, position="u32", block=BlockKind(2, 64),
                      encoder_kind="table")
    assert fm.count(b"TA") == 2
    assert sorted(fm.locate(b"TA")) == [5, 18]
    assert sorted(fm.locate(b"GGC")) == []
    assert sorted(fm.locate(b"UNDEF")) == [25, 26]
