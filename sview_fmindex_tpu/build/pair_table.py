"""2-step (pair) occurrence table: two LF steps in one rank query.

Backward search advances one symbol per step; each step costs a sort +
stream-kernel pass (``ops/stream_join.py``), and at mid-size batches those
fixed costs dominate.  This table lets the search consume TWO pattern
symbols per step, halving the number of passes.

Math (validated exhaustively vs composed single steps on random texts):
for consecutive pattern symbols s1, s2 (s2 processed first),

    step(step(pos, s2), s1)
      = C2[s2*sigma + s1] + rank2(pos, s2*sigma + s1) - corr

where
- ``rank2(pos, c)`` counts table entries ``j < p`` (the usual shifted
  ``p = pos + (pos < sentinel)``, ``bwm/mod.rs:202-204``) whose pair code
  is ``c``,
- entry j's code is ``bwt[j]*sigma + next(j)`` with ``next(j)`` the BWT
  symbol at the row LF maps occurrence j to — i.e. the symbol the NEXT
  backward step would consume there,
- ``C2[s2*sigma+s1] = C[s1] + rank(C[s2], s1)`` (16 scalars),
- exactly one entry j* has an undefined ``next`` (its LF target is the
  sentinel row, where the reference walk yields ``None``,
  ``bwm/mod.rs:217-236``); it is stored with code ``c* = bwt[j*]*sigma``
  and the query subtracts ``corr = (c == c*) & (j* < p)``.

Build runs ON DEVICE from the fused table (nothing extra crosses the
host->device link).  The crucial identity: LF targets of the k-th
occurrence of symbol s are the CONSECUTIVE rows ``C[s] + k``, so
``next`` over all entries is one gather ``bwt[shifted(C[bwt[j]] + occ_j)]``
— no sorting, no per-entry walks.

The table itself reuses the v3 stream layout with sigma' = sigma^2
(16 checkpoint rows + 4 bit-plane rows per 128 positions at sigma=4 —
32 rows, G=1) and is served by the same Pallas join kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stream_join as sj

U32 = jnp.uint32

CHUNK = 1 << 27  # positions per build pass (multiple of 128*32)


def _bit_columns(meta, fused: jax.Array, min_blocks: int = 0):
    """Per-plane, position-ordered uint32 bit words as ONE flat 1-D array.

    Returns (cols, blocks): ``cols[(p*fl + w%fl)*blocks + w//fl]`` is the
    w-th position-ordered 32-bit word of plane p (MSB-first within the
    word).  Everything stays 1-D — small-minor-dim intermediates blow up
    under TPU layout tiling.  ``min_blocks`` zero-pads each lane column so
    chunked consumers can slice past the text end.
    """
    sigma = meta.sigma
    fl = meta.num_lanes
    nb = fused.shape[0]
    nb_pad = max(nb, min_blocks)
    Wf = fused.shape[1]
    f1 = fused.reshape(-1)
    P = sj._planes_for(sigma)
    per_plane = []
    for p in range(P):
        for l in range(fl):
            off = sigma + p * fl + l
            col = jax.lax.slice(f1, (off,), (off + (nb - 1) * Wf + 1,), (Wf,))
            if nb_pad > nb:
                col = jnp.concatenate(
                    [col, jnp.zeros(nb_pad - nb, jnp.uint32)])
            per_plane.append(col)
    return jnp.concatenate(per_plane), nb_pad


def _word_at(meta, cols: jax.Array, nb: int, widx: jax.Array, plane: int):
    """Gather plane ``plane``'s position-ordered word ``widx`` from the
    flat column layout of :func:`_bit_columns`."""
    fl = meta.num_lanes
    lane = widx % fl
    b = widx // fl
    return jnp.take(cols, (plane * fl + lane) * nb + b)


def _sym_at(meta, cols: jax.Array, nb: int, pos: jax.Array) -> jax.Array:
    """BWT symbol (table space) at position ``pos`` — gathers one word per
    plane and extracts the MSB-first bit."""
    P = sj._planes_for(meta.sigma)
    widx = pos >> U32(5)
    bit = U32(31) - (pos & U32(31))
    sym = jnp.zeros(pos.shape, jnp.int32)
    for p in range(P):
        w = _word_at(meta, cols, nb, widx, p)
        sym = sym | (((w >> bit) & U32(1)).astype(jnp.int32) << p)
    return sym


def _sym_seq(meta, cols: jax.Array, nb: int, a, m: int) -> jax.Array:
    """BWT symbols for the CONTIGUOUS position range [a, a+m) — pure word
    slices + bit spreading, no gathers (the per-chunk decode was the
    dominant build cost as gathers: ~7 s per 2^27 chunk on a v5e).

    ``a`` is a TRACED uint32 scalar (dynamic slices), so every full-size
    chunk of a build shares one compiled program; the caller guarantees
    ``a`` and ``m`` are multiples of 128*32 (word index divisible by the
    lane count).
    """
    P = sj._planes_for(meta.sigma)
    fl = meta.num_lanes
    w0 = jnp.asarray(a, U32) >> U32(5)
    nwords = m >> 5
    shifts = U32(31) - jnp.arange(32, dtype=jnp.uint32)
    sym = jnp.zeros((nwords, 32), jnp.int32)
    for p in range(P):
        # position-ordered word w maps to cols[(p*fl + w%fl)*nb + w//fl];
        # contiguous words split into fl lane-residue slices, re-interleaved
        parts = []
        for l in range(fl):
            off = U32((p * fl + l) * nb) + w0 // U32(fl)
            parts.append(jax.lax.dynamic_slice(cols, (off,), (nwords // fl,)))
        w = jnp.stack(parts, axis=1).reshape(nwords) if fl > 1 else parts[0]
        bits = ((w[:, None] >> shifts[None, :]) & U32(1)).astype(jnp.int32)
        sym = sym | (bits << p)
    return sym.reshape(m)


@functools.partial(jax.jit, static_argnums=(0, 2, 4))
def _pair_chunk(meta, cols, nb_f: int, a, m: int, occ_carry, count_arr,
                sentinel):
    """Pair codes for table positions [a, a+m) plus carries.

    ``a`` is traced (uint32) — every 2^27-position chunk of a Gbp build
    shares ONE compiled program instead of re-tracing per chunk (only the
    chunk SIZE ``m`` is static).  Returns (codes int32 [m], occ_carry',
    special_j int32 (local index of the sentinel-target entry or -1)).
    """
    sigma = meta.sigma
    pos = jnp.arange(m, dtype=jnp.uint32) + jnp.asarray(a, U32)
    s = _sym_seq(meta, cols, nb_f, a, m)
    # occ rank: exclusive running count of s within [0, j)
    occ = jnp.zeros(m, U32)
    carry2 = occ_carry
    for c in range(sigma):
        is_c = s == c
        cum = jnp.cumsum(is_c.astype(U32)) - is_c.astype(U32)
        occ = jnp.where(is_c, cum + occ_carry[c], occ)
        carry2 = carry2.at[c].add(jnp.sum(is_c.astype(U32)))
    from ..ops.search import take_small

    src = take_small(count_arr, s, sigma + 1) + occ  # LF target (query row)
    special = src == sentinel - U32(1)
    shifted = src + (src < sentinel).astype(U32)
    nxt = _sym_at(meta, cols, nb_f, shifted)
    code = s * sigma + jnp.where(special, 0, nxt)
    sp_j = jnp.where(jnp.any(special),
                     jnp.argmax(special).astype(jnp.int32), jnp.int32(-1))
    return code, carry2, sp_j


@functools.partial(jax.jit, static_argnums=(0, 2))
def _chunk_words_and_counts(sigma2: int, codes: jax.Array, m: int):
    """Pack 4..6 code bit-planes into MSB-first uint32 words and count
    per-SBL-block code occurrences.  All 1-D / wide-minor shapes."""
    P2 = sj._planes_for(sigma2)
    words = []
    for p in range(P2):
        bits = ((codes >> p) & 1).astype(jnp.uint32)
        acc = jnp.zeros(m // 32, U32)
        for t in range(32):
            acc = acc + (jax.lax.slice(bits, (t,), (m,), (32,))
                         << U32(31 - t))
        words.append(acc)
    blocks = m // sj.SBL
    counts = []
    for c in range(sigma2):
        is_c = (codes == c).astype(U32).reshape(blocks, sj.SBL)
        counts.append(jnp.sum(is_c, axis=1, dtype=U32))
    return words, counts


def build_pair_table_device(meta, fused: jax.Array, count_arr, sentinel,
                            text_len: int, tile_rows: int,
                            want_gather: bool = True):
    """Returns (pair_tbl int32 [n_tiles2 * rw2, tile_rows], c2 uint32
    [sigma^2], fix uint32 [2] = (j_star, c_star)).

    ``j_star = 0xFFFFFFFF`` when no sentinel-target entry exists (n <= 1).
    Requires ``sigma**2 <= 63`` (the stream kernel's symbol budget).
    """
    sigma = meta.sigma
    sigma2 = sigma * sigma
    assert sigma2 <= 63, sigma
    n = text_len
    # chunk granularity: multiple of 128*32 (block and word aligned), no
    # bigger than the text needs (a fixed 2^27 chunk would dominate small
    # builds)
    chunk = min(CHUNK, -(-max(n, 1) // 4096) * 4096)
    n_pad_pos = -(-max(n, 1) // chunk) * chunk
    cols, nb_f = _bit_columns(
        meta, fused, min_blocks=-(-n_pad_pos // meta.block_len))

    occ_carry = jnp.zeros(sigma, U32)
    plane_words = []  # per chunk: list of per-plane word arrays
    blk_counts = []  # per chunk: list of per-code block-count arrays
    j_star = 0xFFFFFFFF
    c_star = 0
    P2 = sj._planes_for(sigma2)
    for a in range(0, n_pad_pos, chunk):
        m = chunk
        codes, occ_carry, sp_j = _pair_chunk(
            meta, cols, nb_f, np.uint32(a), m, occ_carry, count_arr, sentinel)
        # positions >= n are padding: their plane bits / counts must be
        # excluded exactly like build_stream_table's pad handling —
        # force code sigma2 (counted by nobody, plane bits may be junk
        # past n but rank masks never reach them... except plane bits DO
        # get ORed into the last partial word; zero them explicitly)
        if a + m > n:
            pos = jnp.arange(m, dtype=jnp.uint32) + U32(a)
            codes = jnp.where(pos < U32(n), codes, jnp.int32(sigma2))
        w, cts = _chunk_words_and_counts(sigma2 + 1, codes, m)
        plane_words.append(w[:P2])
        blk_counts.append([c for c in cts[:sigma2]])
        if j_star == 0xFFFFFFFF:
            sp = int(sp_j)
            if sp >= 0 and a + sp < n:
                j_star = a + sp
                c_star = int(codes[sp])

    words = tuple(jnp.concatenate([pw[p] for pw in plane_words])
                  for p in range(P2))
    counts = tuple(jnp.concatenate([bc[c] for bc in blk_counts])
                   for c in range(sigma2))
    tbl, gtbl, c2 = _assemble(meta, fused, count_arr, sentinel, words, counts,
                              n, tile_rows, want_gather)
    fix = jnp.asarray(np.array([j_star, c_star], dtype=np.uint32))
    return tbl, gtbl, c2, fix


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _assemble(meta, fused, count_arr, sentinel, words, counts, n: int,
              tile_rows: int, want_gather: bool = True):
    """v3-layout table assembly + C2 (one program; eager op-by-op dispatch
    of the ~100 small steps costs tens of seconds)."""
    sigma = meta.sigma
    sigma2 = sigma * sigma
    RW2, G2 = sj._layout(sigma2, tile_rows)
    n_blocks_s = n // sj.SBL + 1
    n_tiles = -(-(-(-n_blocks_s // tile_rows)) // G2) * G2
    n_pad = n_tiles * tile_rows

    def pad_to(x, ln):
        if x.shape[0] < ln:
            return jnp.concatenate([x, jnp.zeros(ln - x.shape[0], x.dtype)])
        return x[:ln]

    rows = []
    for c in range(sigma2):
        ck = pad_to(counts[c], n_pad)
        # exclusive cumsum over blocks, zeroed past the real block count
        # (matches build_stream_table: pad blocks keep checkpoint 0)
        cum = jnp.cumsum(ck, dtype=U32) - ck
        cum = jnp.where(jnp.arange(n_pad) < n_blocks_s, cum, U32(0))
        rows.append(cum.reshape(n_tiles, tile_rows))
    zero = jnp.zeros((n_tiles, tile_rows), U32)
    for p in range(sj._planes_for(sigma2)):
        wp = pad_to(words[p], n_pad * sj.LANES)
        for l in range(sj.LANES):
            rows.append(jax.lax.slice(
                wp, (l,), ((n_pad - 1) * sj.LANES + l + 1,),
                (sj.LANES,)).reshape(n_tiles, tile_rows))
    while len(rows) < RW2:
        rows.append(zero)  # padded-layout fallback (large sigma2)
    tbl = jnp.stack(rows, axis=1).reshape(n_tiles * RW2, tile_rows)
    tbl = jax.lax.bitcast_convert_type(tbl, jnp.int32)

    # gather layout (opt-in): fused-style rows [n_blocks2, sigma2+P2*LANES]
    # over SBL-length blocks, served by ops.rank with a sigma2 meta.
    # Measured on a v5e: its 128 B row gathers cost ~3x a fused-row
    # gather, so the stream engine stays the default consumer.
    P2 = sj._planes_for(sigma2)
    if want_gather:
        nb2 = n // sj.SBL + 1
        gcols = []
        for c in range(sigma2):
            ck = pad_to(counts[c], nb2)
            gcols.append(jnp.cumsum(ck, dtype=U32) - ck)
        for p in range(P2):
            wp = pad_to(words[p], nb2 * sj.LANES)
            for l in range(sj.LANES):
                gcols.append(jax.lax.slice(
                    wp, (l,), ((nb2 - 1) * sj.LANES + l + 1,), (sj.LANES,)))
        gtbl = jnp.stack(gcols, axis=1)
    else:
        gtbl = jnp.zeros((1, 8), U32)

    # C2[s2*sigma + s1] = C[s1] + rank(C[s2], s1)
    from ..ops.rank import rank_next

    s2v, s1v = jnp.divmod(jnp.arange(sigma2, dtype=jnp.int32), sigma)
    cpos = jnp.take(count_arr, s2v).astype(U32)
    c2 = jnp.take(count_arr, s1v).astype(U32) + rank_next(
        meta, fused, sentinel, cpos, s1v)
    return tbl, gtbl, c2
