"""Batched lockstep backward search (count).

The reference's per-pattern recursion (``locate/with_slice.rs:21-33``) becomes
one jitted program over a [B, Lmax] pattern batch: the k-mer LUT seeds every
lane's range in O(1) (``count_array.rs:203-223``, incl. the short-pattern
subtree range), then a ``fori_loop`` advances all lanes one LF step per
iteration with done-masks.  Both range endpoints of all lanes are ranked in a
single fused-table gather per step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rank import U32, rank_next


def encode_patterns(enc_table: jax.Array, patterns: jax.Array) -> jax.Array:
    """raw pattern bytes [B, L] -> symbol indices int32 [B, L]."""
    return jnp.take(enc_table, patterns.astype(jnp.int32), axis=0).astype(jnp.int32)


def initial_range(meta, kmer_tbl: jax.Array, sym: jax.Array, lens: jax.Array):
    """k-mer LUT seeding.  sym int32 [B, L], lens int32 [B].

    Returns (lo, hi) uint32 [B] and rem_steps int32 [B] (LF steps left).
    """
    k = meta.kmer_size
    base = meta.sigma + 1
    Lmax = sym.shape[-1]
    m = jnp.minimum(lens, k)
    start = jnp.zeros(sym.shape[:-1], dtype=jnp.int32)
    for i in range(k):
        j = jnp.clip(lens - m + i, 0, max(Lmax - 1, 0))
        digit = jnp.take_along_axis(sym, j[..., None], axis=-1)[..., 0] + 1
        start = start + jnp.where(i < m, digit * (base ** (k - 1 - i)), 0)
    # gap covers the unsearched low digits for short patterns
    # (count_array.rs:209-215); 0 when len >= k.
    powers = jnp.asarray([base**e for e in range(k + 1)], dtype=jnp.int32)
    gap = jnp.take(powers, k - m) - 1
    lo = jnp.take(kmer_tbl, start - 1)
    hi = jnp.take(kmer_tbl, start + gap)
    rem_steps = jnp.maximum(lens - k, 0)
    return lo, hi, rem_steps


def pos_ranges(meta, fused, kmer_tbl, count_arr, sentinel, sym, lens):
    """Full backward search: (lo, hi) uint32 [B] for every pattern lane."""
    lo, hi, rem_steps = initial_range(meta, kmer_tbl, sym, lens)
    Lmax = sym.shape[-1]
    steps = max(Lmax - meta.kmer_size, 0)
    if steps == 0:
        return lo, hi

    def body(t, carry):
        lo, hi = carry
        active = (t < rem_steps) & (lo < hi)
        j = jnp.clip(lens - meta.kmer_size - 1 - t, 0, Lmax - 1)
        s = jnp.take_along_axis(sym, j[..., None], axis=-1)[..., 0]
        pre = jnp.take(count_arr, s)
        # one fused gather for both endpoints of every lane
        both = jnp.concatenate([lo, hi])
        ranks = rank_next(meta, fused, sentinel, both, jnp.concatenate([s, s]))
        b = lo.shape[0]
        nlo = pre + ranks[:b]
        nhi = pre + ranks[b:]
        return jnp.where(active, nlo, lo), jnp.where(active, nhi, hi)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo, hi


def count_batch(meta, fused, kmer_tbl, count_arr, sentinel, enc_table, patterns, lens):
    """counts uint32 [B] for raw byte patterns [B, Lmax] with lengths [B]."""
    sym = encode_patterns(enc_table, patterns)
    lo, hi = pos_ranges(meta, fused, kmer_tbl, count_arr, sentinel, sym, lens.astype(jnp.int32))
    return hi - lo
