"""Streaming sort-join rank engine (the TPU speed-of-light path).

The XLA row-gather that serves ``ops.rank`` costs ~23-26 ns per random row on
TPU (HBM-latency bound, measured) — it is the entire cost of backward search
at large batch.  This module replaces it for big batches:

1. Sort the 2B query positions (device sort is ~2-6 ns/elt — an order of
   magnitude cheaper than gathering) carrying a packed ``idx<<6|sym`` payload.
2. One Pallas kernel streams the occ table HBM->VMEM tile by tile at full
   bandwidth while walking the sorted queries chunk by chunk (manual DMA with
   a persistent SMEM cursor — the TPU grid is sequential).  Each sub-chunk of
   128 queries fetches its rows from the resident tile with lane-dimension
   ``take_along_axis`` (one per 128-block group, composed with a group select
   — Mosaic's gather reaches only one vreg along the gather dim), and the
   rank math is bit-plane combine + population_count on the VPU.
3. Sort the ranks back to lane order by the packed payload.

Device table layout (v2 — BIT PLANES, built at upload, decoupled from the
blob's per-64/32-bit vectors): per tile of T stream-blocks of ``SBL``=128
positions each, an int32 matrix ``[RW, T]`` (tiles stacked to
``[n_tiles*RW, T]``) where column b describes stream-block b of the tile:

- rows ``0..sigma``: the block's rank checkpoint words (counts of each symbol
  before the block — same values the reference snapshots per block,
  ``bwm/mod.rs:126-134``),
- rows ``sigma + p*4 + l`` for plane p, lane l in 0..4: MSB-first uint32
  bit-plane lanes (lane l covers positions [32l, 32l+32); position i maps to
  bit ``31 - i%32``) — the same decomposition as the fused gather table
  (``ops.rank``), re-blocked to SBL positions,
- remaining rows up to RW (multiple of 8): zero padding.

At sigma=4 this is 64 B per 128 positions (0.5 B/position) vs the v1 byte
layout's 96 B per 64 positions (1.5 B/position): 3x less HBM streamed.

Semantics preserved bit-exactly vs ``ops.rank``:
- ``rank_next``: the +1 shift below the sentinel row happens XLA-side before
  the sort (``bwm/mod.rs:202-204``).
- ``pre_rank_and_symidx``: the decode variant extracts one bit per plane at
  the row position; the sentinel row is masked XLA-side
  (``bwm/mod.rs:217-236``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

# stream-table block length (independent of the blob's Block kind)
SBL = 128
SBL_SHIFT = 7
LANES = SBL // 32  # u32 lanes per plane per block


def _planes_for(sigma: int) -> int:
    return max(1, (sigma - 1).bit_length())


def _rw(sigma: int) -> int:
    """Rows per stream block: sigma checkpoint words + plane lanes — EXACT,
    no 8-row padding (v3 layout).  Mosaic's 8-sublane block divisibility is
    satisfied by grouping ``_group(sigma)`` tiles per pipeline block
    instead of padding rows: at sigma=4 this streams 48 B per 128
    positions instead of 64 B — a 25% cut in the per-pass HBM floor."""
    return sigma + _planes_for(sigma) * LANES


def _group(sigma: int, tile_rows: int) -> int:
    """Tiles per Pallas pipeline block.  G=2 when that makes the block
    8-sublane divisible (r % 4 == 0, e.g. sigma=4 -> r=12); the kernel body
    is emitted once per residue with STATIC row offsets (Mosaic rejects
    dynamic sublane starts but handles unaligned static ones), so G is
    capped at 2 to bound code size — other shapes fall back to padding."""
    r = _rw(sigma)
    if r % 8 == 0:
        return 1
    if r % 4 == 0 and 2 * r * tile_rows * 4 <= (4 << 20):
        return 2
    return 0  # sentinel: pad rows to a multiple of 8 instead


def _layout(sigma: int, tile_rows: int) -> tuple[int, int]:
    """(rows_per_tile, tiles_per_block).  tiles_per_block == 1 with padded
    rows when grouping would blow the VMEM budget."""
    g = _group(sigma, tile_rows)
    if g == 0:
        return -(-_rw(sigma) // 8) * 8, 1
    return _rw(sigma), g


# ---------------------------------------------------------------------------
# host-side table construction
# ---------------------------------------------------------------------------

def build_stream_table(sigma: int, bwt_symbols: np.ndarray,
                       tile_rows: int) -> np.ndarray:
    """int32 [n_tiles*RW, tile_rows] transposed bit-plane stream table.

    ``bwt_symbols``: uint8 [n] sentinel-removed BWT symbol indices.
    Checkpoints are recomputed here for SBL-length blocks (the blob's own
    checkpoints may use a different block length).  Positions past the text
    end get plane bits 0; rank masks exclude them (pos <= n always).
    """
    n = bwt_symbols.shape[0]
    n_blocks = n // SBL + 1
    RW, G = _layout(sigma, tile_rows)
    n_tiles = -(-(-(-n_blocks // tile_rows)) // G) * G
    n_blocks_pad = n_tiles * tile_rows
    P = _planes_for(sigma)

    pad_len = n_blocks * SBL - n
    sym_padded = np.concatenate(
        [bwt_symbols, np.zeros(pad_len, dtype=np.uint8)]
    ).reshape(n_blocks, SBL)

    big = np.zeros((n_blocks_pad, RW), dtype=np.uint32)
    for s in range(sigma):
        per_block = (sym_padded == s).sum(axis=1, dtype=np.uint32)
        if s == 0 and pad_len:
            per_block[-1] -= pad_len  # pad positions are not symbol 0
        np.cumsum(per_block[:-1], out=big[1:n_blocks, s])
    for p in range(P):
        bits = ((sym_padded >> p) & 1).astype(np.uint8)
        packed = np.packbits(bits, axis=1)  # MSB-first bytes [n_blocks, SBL/8]
        lanes = np.ascontiguousarray(packed).view(">u4").astype(np.uint32)
        big[:n_blocks, sigma + p * LANES : sigma + (p + 1) * LANES] = lanes

    out = (
        big.reshape(n_tiles, tile_rows, RW)
        .transpose(0, 2, 1)
        .reshape(n_tiles * RW, tile_rows)
    )
    return np.ascontiguousarray(out).view(np.int32)


def stream_table_rows(sigma: int, text_len: int, tile_rows: int) -> int:
    """Host-side row count of the stream table (``meta.stream_rows``)."""
    n_blocks = text_len // SBL + 1
    RW, G = _layout(sigma, tile_rows)
    n_tiles = -(-(-(-n_blocks // tile_rows)) // G) * G
    return n_tiles * RW


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def derive_stream_table(meta, fused: jax.Array, text_len: int,
                        tile_rows: int) -> jax.Array:
    """Build the stream table ON DEVICE from the fused gather table.

    Bit-identical to :func:`build_stream_table`'s output, but as a
    reshape/slice/transpose program over data already in HBM — at Gbp scale
    the host build (unpackbits over GBs) plus the 500 MB upload cost ~60 s
    of wall time through a ~30 MB/s tunnel; this runs in well under a
    second on device.

    Works because both tables carry the same information at different
    granularity: the fused table's MSB-first uint32 plane lanes re-group
    directly into SBL=128-position stream blocks (``BL <= 128`` for every
    Block kind), and a stream block's checkpoint (count of each symbol
    before position ``128*b``) IS the fused checkpoint of fused block
    ``(128//BL)*b``.  Stream planes are the low ``_planes_for(sigma)``
    fused planes (upper planes are all-zero when sigma < 2**num_planes).
    """
    sigma = meta.sigma
    BL = meta.block_len
    assert SBL % BL == 0, (SBL, BL)
    g = SBL // BL  # fused blocks per stream block
    P = _planes_for(sigma)
    assert P <= meta.num_planes, (P, meta.num_planes)
    RW, G = _layout(sigma, tile_rows)
    fl = meta.num_lanes
    Wf = fused.shape[1]
    n_blocks_s = text_len // SBL + 1
    n_tiles = -(-(-(-n_blocks_s // tile_rows)) // G) * G
    n_pad = n_tiles * tile_rows
    # 1-D strided construction: every stream word w is a stride-(g*Wf)
    # slice of the flattened fused table.  Intermediates with tiny minor
    # dims ([n_pad, RW], [need, Wf]) blow up 8-16x under TPU (8,128)
    # layout tiling and OOM at Gbp scale — everything here stays 1-D or
    # [*, tile_rows]-minor.
    stride = g * Wf
    need = n_pad * stride
    f1 = fused.reshape(-1)
    if need > f1.shape[0]:
        f1 = jnp.concatenate(
            [f1, jnp.zeros(need - f1.shape[0], jnp.uint32)])
    else:
        f1 = f1[:need]

    def word(w: int) -> jax.Array:
        if w < sigma:
            off = w  # checkpoint word of the stream block's first fused block
        else:
            q = w - sigma
            p, l = q // LANES, q % LANES
            off = (l // fl) * Wf + sigma + p * fl + (l % fl)
        return jax.lax.slice(f1, (off,), (off + (n_pad - 1) * stride + 1,),
                             (stride,))

    zero = jnp.zeros((n_tiles, tile_rows), jnp.uint32)
    rows = [word(w).reshape(n_tiles, tile_rows)
            if w < sigma + P * LANES else zero
            for w in range(RW)]
    out = jnp.stack(rows, axis=1).reshape(n_tiles * RW, tile_rows)
    return jax.lax.bitcast_convert_type(out, jnp.int32)


SEG_BLOCKS = 1 << 24  # wide-table segment: 2^24 stream blocks = 2^31 positions


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def derive_stream_table_wide(meta, fused: jax.Array, text_len: int,
                             tile_rows: int):
    """Stream table for a WIDE (two-lane u64-position) index, served by the
    ``blkkey`` kernel variant.

    The kernel stays pure u32: checkpoints are stored SEGMENT-LOCAL (count
    of each symbol between the segment's first block and this block — at
    most 2^31 positions, so u32 is exact), and the returned
    ``seg_base`` u32 [2, n_segs * sigma] holds the 2-lane GLOBAL count at
    each segment start; the caller adds it back outside the kernel.  Wide
    fused layout: [n_blocks, 2*sigma + planes*lanes] (hi ckpts, lo ckpts,
    plane lanes) — see ``DeviceFmIndex._from_host_wide``.

    Requires ``tile_rows`` to divide ``SEG_BLOCKS`` so every tile lies in
    one segment.
    """
    sigma = meta.sigma
    BL = meta.block_len
    assert SBL % BL == 0, (SBL, BL)
    assert SEG_BLOCKS % tile_rows == 0, (SEG_BLOCKS, tile_rows)
    g = SBL // BL
    P = _planes_for(sigma)
    assert P <= meta.num_planes, (P, meta.num_planes)
    RW, G = _layout(sigma, tile_rows)
    fl = meta.num_lanes
    Wf = fused.shape[1]
    n_blocks_s = text_len // SBL + 1
    n_tiles = -(-(-(-n_blocks_s // tile_rows)) // G) * G
    n_pad = n_tiles * tile_rows
    n_segs = -(-n_pad // SEG_BLOCKS)
    stride = g * Wf
    need = n_pad * stride
    f1 = fused.reshape(-1)
    if need > f1.shape[0]:
        f1 = jnp.concatenate([f1, jnp.zeros(need - f1.shape[0], jnp.uint32)])
    else:
        f1 = f1[:need]

    def word(off: int) -> jax.Array:
        return jax.lax.slice(f1, (off,), (off + (n_pad - 1) * stride + 1,),
                             (stride,))

    # seg_base: global 2-lane checkpoint at each segment's first block
    seg_starts = jnp.arange(n_segs, dtype=jnp.int32) * SEG_BLOCKS * stride
    base_h = []
    base_l = []
    for s in range(sigma):
        base_h.append(jnp.take(f1, seg_starts + s))
        base_l.append(jnp.take(f1, seg_starts + sigma + s))
    seg_base = jnp.stack([
        jnp.stack(base_h, axis=1).reshape(-1),
        jnp.stack(base_l, axis=1).reshape(-1)])  # [2, n_segs*sigma]

    tiles_per_seg = SEG_BLOCKS // tile_rows
    tile_seg = jnp.arange(n_tiles, dtype=jnp.int32) // tiles_per_seg

    zero = jnp.zeros((n_tiles, tile_rows), jnp.uint32)
    rows = []
    for w in range(RW):
        if w < sigma:
            # local checkpoint = global_lo - seg_base_lo: the true local
            # count < 2^31, so the wrapping u32 subtraction of the low
            # words is exact (no hi word needed)
            glo = word(sigma + w).reshape(n_tiles, tile_rows)
            bl = jnp.take(seg_base[1], tile_seg * sigma + w)
            rows.append(glo - bl[:, None])
        elif w < sigma + P * LANES:
            q = w - sigma
            p, l = q // LANES, q % LANES
            off = (l // fl) * Wf + 2 * sigma + p * fl + (l % fl)
            rows.append(word(off).reshape(n_tiles, tile_rows))
        else:
            rows.append(zero)
    out = jnp.stack(rows, axis=1).reshape(n_tiles * RW, tile_rows)
    return jax.lax.bitcast_convert_type(out, jnp.int32), seg_base


# ---------------------------------------------------------------------------
# the join kernel
# ---------------------------------------------------------------------------

def _make_kernel(sigma: int, T: int, C: int, n_chunks: int, decode: bool,
                 blkkey: bool = False):
    """Grid over table tiles; walks sorted query chunks with a persistent
    SMEM cursor.  ``decode=False``: rank_next(pos, sym).  ``decode=True``:
    (rank, symidx) at pos (the locate-walk primitive).

    Queries live in HBM as [N/128, 128] rows; a chunk is CR = C/128 rows,
    processed in CR sub-chunks of 128 queries each.

    One pipeline block covers G consecutive tiles (v3 layout — exact RW
    rows per tile, Mosaic's 8-sublane divisibility satisfied by the G*RW
    block); consecutive grid steps revisit the same block index, so Pallas
    fetches it once.

    ``blkkey`` (the wide-position mode): the ``pos`` operand is the stream
    BLOCK id itself (u32 — valid to 2^38 bp) and the in-block remainder
    rides ``meta`` bits 6..12 (``meta = payload<<13 | rem<<6 | sym``).
    The table must then hold SEGMENT-LOCAL checkpoints (u32 counts, see
    ``derive_stream_table_wide``); the caller adds the 2-lane segment base
    outside the kernel.
    """
    P = _planes_for(sigma)
    RW, G = _layout(sigma, T)
    CR = C // 128
    n_groups = T // 128

    def kernel(pos_hbm, meta_hbm, tile_ref, out_hbm, out2_hbm,
               smem, pos_buf, meta_buf, out_buf, out2_buf,
               in_sems, out_sems):
        t = pl.program_id(0)
        win_lo = t * T
        win_hi = win_lo + T

        def load_chunk(c):
            cp1 = pltpu.make_async_copy(
                pos_hbm.at[pl.ds(c * CR, CR)], pos_buf, in_sems.at[0])
            cp2 = pltpu.make_async_copy(
                meta_hbm.at[pl.ds(c * CR, CR)], meta_buf, in_sems.at[1])
            cp1.start(); cp2.start(); cp1.wait(); cp2.wait()

        @pl.when(t == 0)
        def _():
            smem[0] = 0
            load_chunk(0)
            out_buf[:] = jnp.zeros_like(out_buf)
            out2_buf[:] = jnp.zeros_like(out2_buf)

        def sub_chunk(j, base):
            # ``base`` is STATIC (the kernel body is emitted once per t%G
            # residue): Mosaic rejects dynamic sublane starts but compiles
            # unaligned static slices like [12:24, :] fine.
            pos_row = pos_buf[j].reshape(1, 128)                 # [1,128] u32
            if blkkey:
                blk = pos_row.astype(jnp.int32)
            else:
                blk = (pos_row >> SBL_SHIFT).astype(jnp.int32)
            mine = (blk >= win_lo) & (blk < win_hi)              # [1,128]

            @pl.when(jnp.any(mine))
            def _():
                local = jnp.where(mine, blk - win_lo, 0)         # [1,128]
                grp = local >> 7
                lane = jnp.broadcast_to(local & 127, (RW, 128))
                # NB: guarding each group with @pl.when(any(grp == g)) to
                # skip empty groups was measured 4x SLOWER on v5e (171 vs
                # 41 ns/q at N=200k) — the predicated control flow costs
                # more than the unconditional takes it avoids.
                acc = jnp.zeros((RW, 128), jnp.int32)
                for g in range(n_groups):
                    part = jnp.take_along_axis(
                        tile_ref[base : base + RW, g * 128 : (g + 1) * 128],
                        lane, axis=1)
                    acc = jnp.where(grp == g, part, acc)
                words = acc.astype(jnp.uint32)                   # [RW,128]

                if blkkey:
                    rem = ((meta_buf[j].reshape(1, 128) >> 6) & 127)
                else:
                    rem = (pos_row & U32(SBL - 1)).astype(jnp.int32)

                def wrow(i):  # one table row as [1,128]
                    return words[i].reshape(1, 128)

                if decode:
                    # symbol at the row position: one bit per plane
                    lane_star = rem >> 5
                    bit_star = (U32(31) - (rem.astype(U32) & U32(31)))
                    sym = jnp.zeros((1, 128), jnp.int32)
                    for p in range(P):
                        lv = jnp.zeros((1, 128), U32)
                        for l in range(LANES):
                            lv = jnp.where(lane_star == l,
                                           wrow(sigma + p * LANES + l), lv)
                        bit = (lv >> bit_star) & U32(1)
                        sym = sym + (bit.astype(jnp.int32) << p)
                else:
                    sym = (meta_buf[j] & 63).astype(jnp.int32).reshape(1, 128)

                ckpt = jnp.zeros((1, 128), U32)
                for s in range(sigma):
                    ckpt = jnp.where(sym == s, wrow(s), ckpt)

                cnt = jnp.zeros((1, 128), U32)
                for l in range(LANES):
                    comb = jnp.full((1, 128), 0xFFFFFFFF, U32)
                    for p in range(P):
                        w = wrow(sigma + p * LANES + l)
                        bit_p = ((sym >> p) & 1) == 1
                        comb = comb & jnp.where(bit_p, w, ~w)
                    take = jnp.clip(rem - 32 * l, 0, 32)
                    shift = jnp.minimum(32 - take, 31).astype(U32)
                    mask = jnp.where(take == 0, U32(0),
                                     (jnp.full((1, 128), 0xFFFFFFFF, U32) << shift))
                    cnt = cnt + jax.lax.population_count(comb & mask)

                rank = ckpt + cnt
                mine1 = mine.reshape(128)
                out_buf[j] = jnp.where(mine1, rank.reshape(128), out_buf[j])
                if decode:
                    out2_buf[j] = jnp.where(mine1, sym.reshape(128), out2_buf[j])

        def cond(carry):
            return carry

        def body(carry):
            if blkkey:
                blks = pos_buf[:].astype(jnp.int32)
            else:
                blks = (pos_buf[:] >> SBL_SHIFT).astype(jnp.int32)
            minblk = jnp.min(blks)
            maxblk = jnp.max(blks)

            @pl.when(minblk < win_hi)
            def _():
                if G == 1:
                    for j in range(CR):
                        sub_chunk(j, 0)
                else:
                    for gi in range(G):
                        @pl.when(t % G == gi)
                        def _(gi=gi):
                            for j in range(CR):
                                sub_chunk(j, gi * RW)

            c = smem[0]
            done_chunk = maxblk < win_hi

            @pl.when(done_chunk)
            def _():
                cp = pltpu.make_async_copy(
                    out_buf, out_hbm.at[pl.ds(c * CR, CR)], out_sems.at[0])
                cp.start()
                if decode:
                    cp2 = pltpu.make_async_copy(
                        out2_buf, out2_hbm.at[pl.ds(c * CR, CR)], out_sems.at[1])
                    cp2.start(); cp2.wait()
                cp.wait()
                smem[0] = c + 1

                @pl.when(c + 1 < n_chunks)
                def _():
                    load_chunk(c + 1)
                    out_buf[:] = jnp.zeros_like(out_buf)
                    if decode:
                        out2_buf[:] = jnp.zeros_like(out2_buf)

            return done_chunk & (c + 1 < n_chunks)

        jax.lax.while_loop(cond, body, smem[0] < n_chunks)

    return kernel, RW


@functools.lru_cache(maxsize=64)
def _join_fn(sigma: int, T: int, C: int, n_tiles: int, n_chunks: int,
             decode: bool, interpret: bool, blkkey: bool = False):
    kernel, RW = _make_kernel(sigma, T, C, n_chunks, decode, blkkey)
    G = _layout(sigma, T)[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((G * RW, T), lambda t: (t // G, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((C // 128, 128), jnp.uint32),
            pltpu.VMEM((C // 128, 128), jnp.int32),
            pltpu.VMEM((C // 128, 128), jnp.uint32),
            pltpu.VMEM((C // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    N = n_chunks * C

    def call(sorted_pos, sorted_meta, table_i32):
        out, out2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
                jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(sorted_pos.reshape(N // 128, 128), sorted_meta.reshape(N // 128, 128),
          table_i32)
        return out.reshape(N), out2.reshape(N)

    return call


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# sorted-rank entry points (sort -> kernel -> unsort)
# ---------------------------------------------------------------------------

def _pad_len(n: int, C: int) -> int:
    return max(-(-n // C) * C, C)


def rank_next_sorted(meta, table_i32: jax.Array, sentinel: jax.Array,
                     pos: jax.Array, sym: jax.Array,
                     T: int = 2048, C: int = 1024) -> jax.Array:
    """Batched ``get_next_rank`` via sort-join.  pos u32 [N], sym i32 [N]
    (sym must be < 64).  Bit-exact vs ``ops.rank.rank_next``."""
    n = pos.shape[0]
    RW = _layout(meta.sigma, T)[0]
    n_tiles = meta.stream_rows // RW
    n_pos_rows = n_tiles * T
    N = _pad_len(n, C)
    pad = N - n

    p = pos + (pos < sentinel).astype(U32)
    if n < (1 << 25):
        # packed payload idx<<6|sym fits int32 only below 2^25 lanes
        packed = (jnp.arange(n, dtype=jnp.int32) << 6) | sym
        sp, sm = jax.lax.sort((p, packed), num_keys=1)
        sp = jnp.concatenate([sp, jnp.full((pad,), n_pos_rows * SBL - 1, U32)])
        sm = jnp.concatenate([sm, (jnp.arange(pad, dtype=jnp.int32) + n) << 6])
        join = _join_fn(meta.sigma, T, C, n_tiles, N // C, False,
                        _use_interpret())
        ranks, _ = join(sp, sm, table_i32)
        _, unsorted = jax.lax.sort((sm, ranks), num_keys=1)
        return unsorted[:n]
    # large-N path (e.g. the upload-time SA fill): carry idx and sym as
    # separate sort operands instead of the packed word
    idx = jnp.arange(n, dtype=jnp.int32)
    sp, si, ss = jax.lax.sort((p, idx, sym), num_keys=1)
    sp = jnp.concatenate([sp, jnp.full((pad,), n_pos_rows * SBL - 1, U32)])
    si = jnp.concatenate([si, jnp.arange(pad, dtype=jnp.int32) + n])
    ss = jnp.concatenate([ss, jnp.zeros(pad, jnp.int32)])
    join = _join_fn(meta.sigma, T, C, n_tiles, N // C, False, _use_interpret())
    ranks, _ = join(sp, ss, table_i32)
    _, unsorted = jax.lax.sort((si, ranks), num_keys=1)
    return unsorted[:n]


def pre_rank_and_symidx_sorted(meta, table_i32: jax.Array, sentinel: jax.Array,
                               pos: jax.Array, T: int = 2048, C: int = 1024):
    """Batched ``get_pre_rank_and_symidx`` via sort-join.

    Returns (rank u32 [N], symidx i32 [N], is_sentinel bool [N]); rank/symidx
    are garbage where is_sentinel (caller masks), matching ``ops.rank``.
    """
    n = pos.shape[0]
    RW = _layout(meta.sigma, T)[0]
    n_tiles = meta.stream_rows // RW
    n_pos_rows = n_tiles * T
    N = _pad_len(n, C)
    pad = N - n

    is_sentinel = pos == (sentinel - U32(1))
    p = pos + (pos < sentinel).astype(U32)
    if n < (1 << 25):
        packed = jnp.arange(n, dtype=jnp.int32) << 6
        sp, sm = jax.lax.sort((p, packed), num_keys=1)
        sp = jnp.concatenate([sp, jnp.full((pad,), n_pos_rows * SBL - 1, U32)])
        sm = jnp.concatenate([sm, (jnp.arange(pad, dtype=jnp.int32) + n) << 6])
        join = _join_fn(meta.sigma, T, C, n_tiles, N // C, True,
                        _use_interpret())
        ranks, syms = join(sp, sm, table_i32)
        _, r_u, s_u = jax.lax.sort((sm, ranks, syms), num_keys=1)
        return r_u[:n], s_u[:n], is_sentinel
    # large-N path: unpacked index payload (idx<<6 overflows int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    sp, si = jax.lax.sort((p, idx), num_keys=1)
    sp = jnp.concatenate([sp, jnp.full((pad,), n_pos_rows * SBL - 1, U32)])
    si = jnp.concatenate([si, jnp.arange(pad, dtype=jnp.int32) + n])
    join = _join_fn(meta.sigma, T, C, n_tiles, N // C, True, _use_interpret())
    ranks, syms = join(sp, jnp.zeros_like(si), table_i32)
    _, r_u, s_u = jax.lax.sort((si, ranks, syms), num_keys=1)
    return r_u[:n], s_u[:n], is_sentinel


# ---------------------------------------------------------------------------
# BWT decode (upload-time table source)
# ---------------------------------------------------------------------------

def bwt_from_planes(lanes: np.ndarray, num_planes: int, n: int,
                    chunk_blocks: int = 1 << 20) -> np.ndarray:
    """Recover the sentinel-removed BWT symbol stream from the blob's
    MSB-first bit-plane lanes (uint32 [n_blocks, num_planes, num_lanes]).

    Inverse of the reference's ``Block::vectorize`` shift-in
    (``blocks/block2.rs:18-33``); chunked to bound peak memory at Gbp scale.
    """
    n_blocks = lanes.shape[0]
    block_len = lanes.shape[2] * 32
    out = np.empty(n_blocks * block_len, dtype=np.uint8)
    for b0 in range(0, n_blocks, chunk_blocks):
        b1 = min(b0 + chunk_blocks, n_blocks)
        # big-endian byte view -> unpackbits yields bits in position order
        chunk = lanes[b0:b1]
        bits = np.unpackbits(
            chunk.astype(">u4", copy=False).view(np.uint8), axis=None
        ).reshape(b1 - b0, num_planes, block_len)
        sym = np.zeros((b1 - b0, block_len), dtype=np.uint8)
        for p in range(num_planes):
            sym |= bits[:, p, :] << p
        out[b0 * block_len : b1 * block_len] = sym.ravel()
    return out[:n]
