"""Generate the Rust-interop golden corpus.

Writes small reference-layout blobs across {Position, Block, k, r, encoder}
combos plus a JSON manifest recording the inputs (text, symbols, patterns)
and the expected outputs (count + sorted locate per pattern), in the shape
of the reference's own external-oracle tests
(``/root/reference/sview-fmindex/src/tests/result_answer/other_crate.rs:1-19``).

The expected outputs are cross-checked here against an independent
brute-force oracle (``tests/oracle.py``) before being frozen, so the JSON
is not merely "whatever this repo computes".

A Rust toolchain does not exist in this image (DESIGN.md), so the other
half of the validation ships as source: ``interop/rust_validate/`` loads
every blob through the published ``sview-fmindex`` crate, re-builds each
blob from the recorded text, and asserts (a) byte-identical blobs and
(b) identical count/locate answers.  One command wherever cargo exists:

    cd interop/rust_validate && cargo run --release

Deterministic: re-running this script must reproduce the corpus bit-exactly
(guarded by ``tests/test_interop_corpus.py``).
"""
from __future__ import annotations

import base64
import hashlib
import json
import os
import random
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import sview_fmindex_tpu as fmx  # noqa: E402
from oracle import brute_force_locate  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "corpus")

# (name, position, block, k (1 = LUT None), r (1 = Uncompressed), encoder)
# Encoders: ("table", symbols) plain; ("table_wild", symbols) reserves an
# explicit wildcard slot; ("pass", sigma) pre-encoded indices.
CASES = [
    ("dna_b2u64_k3r2", "u32", "BLOCK2_U64", 3, 2,
     ("table", [b"Aa", b"Cc", b"Gg", b"Tt"])),
    ("dna_b3u64_k3r2", "u32", "BLOCK3_U64", 3, 2,
     ("table", [b"A", b"C", b"G", b"T"])),
    ("dna_b3u64_k1r1", "u32", "BLOCK3_U64", 1, 1,
     ("table", [b"A", b"C", b"G", b"T"])),
    ("dna_b3u128_k2r3", "u32", "BLOCK3_U128", 2, 3,
     ("table", [b"A", b"C", b"G", b"T"])),
    ("dna_b2u32_k2r4", "u32", "BLOCK2_U32", 2, 4,
     ("table", [b"Aa", b"Cc", b"Gg", b"Tt"])),
    ("wild_b3u64_k3r2", "u32", "BLOCK3_U64", 3, 2,
     ("table_wild", [b"A", b"C", b"G", b"T"])),
    ("prot_b5u64_k2r2", "u32", "BLOCK5_U64", 2, 2,
     ("table", [bytes([c]) for c in b"ARNDCQEGHILKMFPSTWYV"])),
    ("prot_b6u64_k2r3", "u32", "BLOCK6_U64", 2, 3,
     ("table", [bytes([c]) for c in b"ARNDCQEGHILKMFPSTWYVBZX*"])),
    ("pass_b4u32_k2r2", "u32", "BLOCK4_U32", 2, 2, ("pass", 9)),
    ("dna_u64_b3u64_k3r2", "u64", "BLOCK3_U64", 3, 2,
     ("table", [b"A", b"C", b"G", b"T"])),
    ("dna_u64_b2u64_k2r1", "u64", "BLOCK2_U64", 2, 1,
     ("table", [b"Aa", b"Cc", b"Gg", b"Tt"])),
    ("pass_u64_b6u64_k2r2", "u64", "BLOCK6_U64", 2, 2, ("pass", 40)),
]

BLOCK_RUST = {  # our BlockKind constant -> the reference's generic type
    "BLOCK2_U32": "Block2<u32>", "BLOCK2_U64": "Block2<u64>",
    "BLOCK2_U128": "Block2<u128>", "BLOCK3_U32": "Block3<u32>",
    "BLOCK3_U64": "Block3<u64>", "BLOCK3_U128": "Block3<u128>",
    "BLOCK4_U32": "Block4<u32>", "BLOCK4_U64": "Block4<u64>",
    "BLOCK5_U64": "Block5<u64>", "BLOCK6_U64": "Block6<u64>",
}


def b64(b: bytes) -> str:
    return base64.b64encode(bytes(b)).decode()


def gen_case(name, position, block_name, k, r, enc_spec):
    rng = random.Random(int(hashlib.sha256(name.encode()).hexdigest(), 16))
    kind, arg = enc_spec
    if kind == "pass":
        sigma = arg
        n = rng.randint(150, 300)
        text = bytes(rng.randrange(sigma) for _ in range(n))
        # every symbol must appear (reference fixture convention,
        # tests/random_data/mod.rs:6-37)
        text = bytes(range(sigma)) + text
        enc = fmx.PassThrough()
        encoder_kind = "pass"
        symbols_json = None
    else:
        symbols = arg
        alphabet = b"".join(symbols)
        n = rng.randint(150, 300)
        text = bytes(rng.choice(alphabet) for _ in range(n))
        text = b"".join(bytes([s[0]]) for s in symbols) + text
        if kind == "table_wild":
            enc = fmx.EncodingTable.from_symbols_with_wildcard(symbols)
            # splice in bytes outside the alphabet — they hit the wildcard
            t = bytearray(text)
            for _ in range(6):
                t[rng.randrange(len(t))] = rng.choice(b"#@!~?")
            text = bytes(t)
        else:
            enc = fmx.EncodingTable.from_symbols(symbols)
        encoder_kind = "table"
        symbols_json = [b64(s) for s in symbols]
        sigma = enc.symbol_count()

    block = getattr(fmx, block_name)
    builder = fmx.FmIndexBuilder(
        len(text), sigma, enc, position=position, block=block,
        suffix_array_config=(fmx.SuffixArrayConfig.compressed(r) if r > 1
                             else fmx.SuffixArrayConfig.uncompressed()),
        lookup_table_config=(fmx.LookupTableConfig.kmer_size(k) if k > 1
                             else fmx.LookupTableConfig.none()),
    )
    blob = bytes(builder.build(text))
    fm = fmx.FmIndex.load(np.frombuffer(blob, np.uint8), position=position,
                          block=block, encoder_kind=encoder_kind)

    # patterns: substrings (always present), short (< k), and absent/junk
    pats = []
    for _ in range(12):
        ln = rng.randint(1, 10)
        st = rng.randrange(len(text) - ln)
        pats.append(text[st:st + ln])
    for ln in (1, 2):
        st = rng.randrange(len(text) - ln)
        pats.append(text[st:st + ln])
    if encoder_kind == "table":
        pats.append(b"\xff\xfe")  # wildcard bytes (or absent for plain)
    else:
        pats.append(bytes([sigma - 1]) * 3)

    expected = []
    enc_text = enc.encode(text)
    for p in pats:
        locs = sorted(int(x) for x in fm.locate(p))
        cnt = int(fm.count(p))
        assert cnt == len(locs), (name, p)
        # independent oracle: brute-force scan over encoded text
        enc_pat = enc.encode(p)
        oracle = brute_force_locate(enc_text, enc_pat)
        assert locs == sorted(oracle), (name, p, locs, oracle)
        expected.append({"pattern": b64(p), "count": cnt, "locations": locs})

    fname = f"{name}.blob"
    with open(os.path.join(OUT, fname), "wb") as f:
        f.write(blob)
    return {
        "name": name,
        "blob": fname,
        "blob_sha256": hashlib.sha256(blob).hexdigest(),
        "position": position,
        "block_rust": BLOCK_RUST[block_name],
        "block": block_name,
        "encoder": encoder_kind,
        "symbols": symbols_json,
        "wildcard_reserved": kind == "table_wild",
        "symbol_count": sigma,
        "text": b64(text),
        "kmer_size_config": k,        # 1 == LookupTableConfig::None
        "sampling_ratio_config": r,   # 1 == SuffixArrayConfig::Uncompressed
        "queries": expected,
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {"format": 1,
                "reference_crate": "sview-fmindex 0.1.2",
                "cases": [gen_case(*c) for c in CASES]}
    with open(os.path.join(OUT, "corpus.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {len(manifest['cases'])} cases to {OUT}")


if __name__ == "__main__":
    main()
