"""Brute-force ground truth + random data generators.

Mirrors the reference's test fixtures (``src/tests/random_data/mod.rs:6-37``):
random distinct ASCII alphabets from 33..126, random texts guaranteed to
contain every alphabet symbol, patterns sampled as true substrings.
"""
from __future__ import annotations

import random

import numpy as np


def gen_rand_symbols(rng: random.Random, count: int) -> list[bytes]:
    chars = rng.sample(range(33, 127), count)
    return [bytes([c]) for c in chars]


def gen_rand_text(rng: random.Random, symbols: list[bytes], min_len: int, max_len: int) -> bytes:
    n = rng.randint(min_len, max_len)
    # guarantee every symbol appears (random_data/mod.rs:17-24)
    body = [rng.choice(symbols) for _ in range(n - len(symbols))] + list(symbols)
    rng.shuffle(body)
    return b"".join(body)


def gen_rand_pattern(rng: random.Random, text: bytes, min_len: int, max_len: int) -> bytes:
    plen = rng.randint(min_len, min(max_len, len(text)))
    start = rng.randint(0, len(text) - plen)
    return text[start : start + plen]


def brute_force_locate(text_sym: np.ndarray, pattern_sym: np.ndarray) -> list[int]:
    """All occurrence positions of pattern in text, both as symbol indices.

    This is the semantic ground truth AFTER encoding — i.e. wildcard collapse
    already applied, matching what the FM-index sees.
    """
    n, m = len(text_sym), len(pattern_sym)
    if m == 0 or m > n:
        return []
    hits = []
    first = pattern_sym[0]
    candidates = np.nonzero(text_sym[: n - m + 1] == first)[0]
    for start in candidates:
        if np.array_equal(text_sym[start : start + m], pattern_sym):
            hits.append(int(start))
    return hits
