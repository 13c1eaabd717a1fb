"""Batched two-phase locate.

Phase 1 (ranges) is :func:`sview_fmindex_tpu.ops.search.pos_ranges`.
Phase 2 expands the [lo, hi) ranges into a flat row buffer of static
capacity (prefix-sum + searchsorted — the batched analog of
``P::as_vec_in_range``, ``locate/mod.rs:19``).
Phase 3 walks every row in lockstep: LF-step until the row index is a
multiple of the sampling ratio, with the sentinel-row short-circuit
emitting ``offset`` (``locate/mod.rs:21-35``); a ``while_loop`` with
done-masks handles the data-dependent trip counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rank import U32, pre_rank_and_symidx


def expand_ranges(lo: jax.Array, hi: jax.Array, capacity: int):
    """[B] ranges -> (rows uint32 [capacity], pat_ids int32, valid bool).

    Row j of pattern p is lo[p] + j.  Rows beyond ``capacity`` are dropped
    (the caller sizes capacity from the counts).
    """
    counts = hi - lo
    cum = jnp.cumsum(counts, dtype=U32)
    j = jnp.arange(capacity, dtype=U32)
    pat = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    total = cum[-1] if cum.shape[0] else U32(0)
    valid = j < total
    pat_c = jnp.clip(pat, 0, lo.shape[0] - 1)
    prev = jnp.take(cum, pat_c - 1)
    start = jnp.where(pat_c == 0, U32(0), prev)
    rows = jnp.take(lo, pat_c) + (j - start)
    return jnp.where(valid, rows, U32(0)), pat_c, valid


def walk_rows(meta, fused, count_arr, sa, sentinel, rows, valid,
              stream_tbl=None, use_stream: bool = False):
    """Resolve BWT rows to text locations.  Returns uint32 [capacity].

    The LF-walk trip count is data-dependent (expected < r, tail ~geometric)
    so the expected case is UNROLLED (masked steps, done-lanes gather the hot
    row 0) and only the rare stragglers pay the while_loop's per-iteration
    overhead.  ``use_stream`` routes the per-step (rank, symbol) decode
    through the streaming sort-join kernel (``ops.stream_join``).
    """
    r = meta.sampling_ratio

    def needs_step(pos, done):
        return (pos % U32(r) != 0) & ~done & valid

    def cond(carry):
        pos, offset, loc, done = carry
        return jnp.any(needs_step(pos, done))

    def body(carry):
        pos, offset, loc, done = carry
        need = needs_step(pos, done)
        pos_q = jnp.where(need, pos, U32(0))  # masked lanes hit block 0
        if use_stream:
            from . import stream_join
            from .search import take_small

            rank, symidx, is_sent = stream_join.pre_rank_and_symidx_sorted(
                meta, stream_tbl, sentinel, pos_q, T=meta.stream_tile)
            pre = take_small(count_arr, symidx, meta.sigma + 1)
        else:
            rank, symidx, is_sent = pre_rank_and_symidx(meta, fused, sentinel, pos_q)
            pre = jnp.take(count_arr, symidx)
        is_sent = is_sent & need
        hit = need & is_sent
        loc = jnp.where(hit, offset, loc)
        done = done | hit
        step = need & ~is_sent
        npos = pre + rank
        pos = jnp.where(step, npos, pos)
        offset = jnp.where(step, offset + 1, offset)
        return pos, offset, loc, done

    pos = rows
    offset = jnp.zeros_like(rows)
    loc = jnp.zeros_like(rows)
    # derive from `valid` so the carry is typed as device-varying under
    # shard_map (a plain constant would fail the while_loop vma check)
    done = valid & False
    if r > 1:
        pos, offset, loc, done = jax.lax.while_loop(cond, body, (pos, offset, loc, done))
    # indices stay uint32: an int32 cast overflows for text_len in [2^31, 2^32)
    sampled = jnp.take(sa, pos // U32(r))
    return jnp.where(done, loc, sampled + offset)


def locate_rows(meta, fused, count_arr, sa, sentinel, lo, hi, capacity: int,
                stream_tbl=None, use_stream: bool = False):
    rows, pat_ids, valid = expand_ranges(lo, hi, capacity)
    if getattr(meta, "has_sa_full", False):
        # full (r=1) SA resident on device: one gather resolves every row,
        # including the sentinel-walk case (SA value 0 at the sentinel row
        # equals the offset the reference walk would emit, locate/mod.rs:27-30)
        # rows stay uint32: an int32 cast overflows for text_len in [2^31, 2^32)
        locs = jnp.where(valid, jnp.take(sa, rows), U32(0))
        return locs, pat_ids, valid
    locs = walk_rows(meta, fused, count_arr, sa, sentinel, rows, valid,
                     stream_tbl=stream_tbl, use_stream=use_stream)
    return locs, pat_ids, valid
