"""DeviceFmIndex: the FM-index as a pytree of device arrays.

This is the TPU-native execution form of the blob (SURVEY.md §7): the blob's
sections become packed device arrays —

- ``fused``     uint32 [n_blocks, sigma + planes*lanes]: rank checkpoints and
  bit-plane lanes interleaved per block so one rank query = one row gather,
- ``kmer_tbl``  uint32 [(sigma+1)^k], ``count_arr`` uint32 [sigma+1],
- ``sa``        uint32 [ceil(n/r)], ``sentinel`` uint32 scalar,
- ``enc_table`` int32 [256] (identity for PassThrough; int32 because
  sub-word gather tables compile pathologically on TPU).

Queries are batched and jitted; see ``sview_fmindex_tpu.ops``.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BuildError
from ..encoders import EncodingTable
from ..ops import locate as locate_ops
from ..ops import search as search_ops



def _enc_static(fm):
    """(enc_table int32 [256], identity, default, pairs) — the encoder's
    static content for compare-select encoding (see IndexMeta)."""
    if isinstance(fm.encoder, EncodingTable):
        enc_table = fm.encoder.table.astype(np.int32)
        enc_default = int(np.bincount(enc_table, minlength=1).argmax())
        enc_pairs = tuple(
            (int(v), int(enc_table[v]))
            for v in range(256) if enc_table[v] != enc_default)
        return enc_table, False, enc_default, enc_pairs
    return np.arange(256, dtype=np.int32), True, 0, ()


def planes_effective(fm) -> int:
    """ceil(log2 sigma) device planes (upper blob planes are all-zero for
    symbols < 2**p) — the plane-reduction rule shared by every upload."""
    return min(fm.block.num_planes, max(1, (fm.symbol_count - 1).bit_length()))


def narrow_fused_rows(fm, planes_eff: int, b0: int, b1: int) -> np.ndarray:
    """Fused gather-table rows for blocks [b0, b1) — buildable per SLICE so
    range-sharded staging never materializes the full table (host peak ~=
    one shard)."""
    sigma = fm.symbol_count
    width = sigma + planes_eff * fm.block.num_lanes
    out = np.empty((b1 - b0, width), dtype=np.uint32)
    out[:, :sigma] = fm.rank_checkpoints[b0:b1].astype(np.uint32)
    out[:, sigma:] = np.ascontiguousarray(
        fm.lanes[b0:b1, :planes_eff, :]).reshape(b1 - b0, -1)
    return out


def wide_fused_rows(fm, planes_eff: int, b0: int, b1: int) -> np.ndarray:
    """Wide fused rows (hi ckpts | lo ckpts | plane lanes) for a block
    slice."""
    sigma = fm.symbol_count
    width = 2 * sigma + planes_eff * fm.block.num_lanes
    out = np.empty((b1 - b0, width), dtype=np.uint32)
    ck = fm.rank_checkpoints[b0:b1].astype(np.uint64)
    out[:, :sigma] = (ck >> np.uint64(32)).astype(np.uint32)
    out[:, sigma : 2 * sigma] = (ck & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 2 * sigma :] = np.ascontiguousarray(
        fm.lanes[b0:b1, :planes_eff, :]).reshape(b1 - b0, -1)
    return out


def split2(a) -> np.ndarray:
    """uint64-ish values -> uint32 [2, ...] (hi, lo) lane pair."""
    a = np.asarray(a, dtype=np.uint64)
    return np.stack([(a >> np.uint64(32)).astype(np.uint32),
                     (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)])


def validate_wide(fm) -> None:
    """The wide-path envelope checks (shared by single-device upload and
    range-shard staging)."""
    kind = fm.block
    if fm.text_len >= 2**38:
        raise BuildError("wide device path requires text_len < 2^38 "
                         "(block indices must fit uint32)")
    if len(fm.kmer_count_table) >= 2**31:
        raise BuildError("kmer table too large for int32 device indexing")
    r = fm.sampling_ratio
    if r < 1 or r > (1 << 15):
        raise BuildError(
            "wide device path requires 1 <= sampling_ratio <= 2^15 "
            "(p_divmod_const envelope)")
    bound = min(r, kind.block_len) << 32
    if fm.text_len >= bound:
        raise BuildError(
            f"wide device path requires text_len < min(sampling_ratio,"
            f" block_len) * 2^32 = {bound} (the SA and block index "
            f"folds are uint32); got text_len {fm.text_len}")


@dataclasses.dataclass(frozen=True)
class IndexMeta:
    """Static (hashable) shape parameters; the jit specialization key."""

    sigma: int
    kmer_size: int
    sampling_ratio: int
    block_len: int
    num_planes: int
    num_lanes: int
    dense_k: int = 0  # device-side dense seed-table k (0 = disabled)
    stream_rows: int = 0  # stream-join table rows (0 = streaming disabled)
    stream_tile: int = 8192  # stream-join tile blocks (measured optimum)
    pair_rows: int = 0  # 2-step pair STREAM table rows (0 = disabled)
    pair_gather: bool = False  # 2-step pair GATHER table resident
    wide_pos: bool = False  # two-lane u32 positions (texts >= 2^32)
    # static encoder content (compare-select encode instead of a 256-entry
    # gather, which is latency-bound at ~18 ns/byte on TPU):
    enc_identity: bool = False  # PassThrough: bytes ARE symbol indices
    enc_pairs: tuple = ()  # ((byte, sym), ...) for bytes != enc_default
    enc_default: int = 0  # what every other byte maps to (the wildcard)
    has_sa_full: bool = False  # full (r=1) SA resident on device


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["fused", "kmer_tbl", "dense_lo", "dense_hi", "count_arr",
                 "sa", "sentinel", "enc_table", "stream_tbl", "pair_tbl",
                 "pair_gtbl", "pair_c2", "pair_fix", "seg_base"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class DeviceFmIndex:
    fused: jax.Array
    kmer_tbl: jax.Array
    dense_lo: jax.Array
    dense_hi: jax.Array
    count_arr: jax.Array
    sa: jax.Array
    sentinel: jax.Array
    enc_table: jax.Array
    stream_tbl: jax.Array
    pair_tbl: jax.Array
    pair_gtbl: jax.Array
    pair_c2: jax.Array
    pair_fix: jax.Array
    # wide stream engine only: 2-lane global counts at segment starts
    # (ops/wide.py); zeros([2,1]) for narrow indexes
    seg_base: jax.Array
    meta: IndexMeta

    # ------------------------------------------------------------------
    @classmethod
    def from_host(cls, fm, device=None, dense_lut_entries: int | None = 1 << 26,
                  dense_lut_cache: str | None = None,
                  dense_host_entries: int = 1 << 20,
                  stream: bool = True, stream_tile: int | None = None,
                  stream_derive: bool = True, sa_fill_ratio: int = 4,
                  sa_full: "np.ndarray | str | None" = None,
                  pair: bool = True, pair_gather: bool = False,
                  force_wide: bool = False,
                  ckpt_derive: "bool | str" = "auto",
                  derived_cache_dir: str | None = None) -> "DeviceFmIndex":
        """Upload a host ``FmIndex`` (the blob's zero-copy views) to device.

        ``dense_lut_entries`` bounds the optional dense seed table
        (``build/dense_lut.py``); None or 0 disables densification.
        ``dense_lut_cache`` (a .npz path) persists the computed table so
        repeated loads of the same blob skip the host-side build pass.
        ``dense_host_entries`` caps the HOST-built part: when
        ``dense_lut_entries`` allows a deeper table, the remaining levels
        extend ON DEVICE with batched LF steps over the uploaded index
        (``extend_dense_lut_device`` — seconds per level at Gbp scale vs a
        multi-minute host pass).
        ``stream`` also uploads the sort-join stream table
        (``ops.stream_join``) used for large query batches.
        ``sa_full``: optional full (r=1) suffix array — uint32 array or path
        to a raw little-endian uint32 file written by
        ``FmIndexBuilder.build(sa_full_path=...)``.  When present it replaces
        the sampled SA on device and locate resolves rows with ONE gather
        instead of the LF walk (results are bit-identical; this is the same
        memoization move as the dense LUT — config invariance semantics).

        ``stream_derive``: build the stream-join table ON DEVICE from the
        uploaded fused table (bit-identical, avoids a host unpackbits pass
        and a ~500 MB upload at Gbp scale); set False to build host-side.
        ``sa_full="device"`` reconstructs the full SA on device from the
        blob's sampled SA strided to ``sa_fill_ratio`` (uploading
        1/sa_fill_ratio of the sampled array; see ``build/sa_fill.py``).

        ``derived_cache_dir``: directory for raw .npy caches of the derived
        device tables (fused gather table, stream-join table) so repeated
        uploads of the same blob skip the host-side derivation passes
        (unpackbits/packbits over GBs at Gbp scale).  Cache keys embed a
        content digest of the blob's SA/count sections — a cache from a
        different text can never be served.

        ``ckpt_derive``: upload only the bit-plane columns and derive the
        checkpoint columns ON DEVICE (``ops.rank.derive_fused_device`` —
        popcount + exclusive cumsum, bit-identical, tested).  Halves the
        fused upload bytes through the tunnel.  ``"auto"`` (default)
        enables it on the TPU backend only (on CPU the "upload" is a
        memcpy, so the host assembly path is cheaper).
        """
        kind = fm.block
        wide = force_wide or fm.text_len >= 2**32
        if wide:
            # two-lane u32 position engine (ops/wide.py): blkkey stream
            # engine + gather fallback; host-level dense seeds; no pair /
            # sa_full
            return cls._from_host_wide(
                fm, device=device, stream=stream,
                dense_host_entries=(dense_host_entries
                                    if dense_lut_entries else 0))
        if len(fm.kmer_count_table) >= 2**31:
            raise BuildError("kmer table too large for int32 device indexing")

        sa_device_fill = isinstance(sa_full, str) and sa_full == "device"
        if sa_device_fill:
            sa_full = None

        if isinstance(sa_full, str):
            # memmap, not fromfile: device_put DMAs straight from the page
            # cache instead of staging a second 4 GB copy in RAM
            sa_full = np.memmap(sa_full, dtype="<u4", mode="r")
        if sa_full is not None:
            if sa_full.shape[0] != fm.text_len:
                raise BuildError(
                    f"sa_full length {sa_full.shape[0]} != text_len {fm.text_len}")
            # guard against a stale cache from a DIFFERENT text of the same
            # length: sa_full[::r] must equal the blob's sampled SA.  A
            # deterministic 64k-probe sample gives the same protection as
            # the full compare (a stale SA differs almost everywhere)
            # without paging in the whole multi-GB memmap.
            n_sa = fm.suffix_array.shape[0]
            probes = np.unique(np.linspace(0, n_sa - 1, min(n_sa, 65536),
                                           dtype=np.int64))
            if not np.array_equal(
                    np.asarray(sa_full[probes * fm.sampling_ratio]),
                    fm.suffix_array[probes].astype(np.uint32)):
                raise BuildError(
                    "sa_full does not match the blob's sampled suffix array "
                    "(stale or mismatched sa_full cache)")

        # content digest guarding EVERY derived cache (a stale cache from a
        # different text of the same shape must never be served)
        import hashlib

        h = hashlib.sha1()
        h.update(np.ascontiguousarray(fm.suffix_array[:65536]).tobytes())
        h.update(np.ascontiguousarray(fm.count_array).tobytes())
        h.update(str((fm.text_len, fm.sentinel_index, kind.num_planes,
                      kind.num_lanes, fm.sampling_ratio)).encode())
        content_digest = h.hexdigest()[:16]
        digest = None
        if derived_cache_dir is not None:
            os.makedirs(derived_cache_dir, exist_ok=True)
            digest = content_digest

        def _cached(name: str, builder_fn):
            if digest is None:
                return builder_fn()
            path = os.path.join(derived_cache_dir, f"{name}_{digest}.npy")
            if os.path.exists(path):
                return np.load(path, mmap_mode="r")
            arr = builder_fn()
            # atomic publish: a crash or a concurrent second process
            # mid-write must never leave a truncated cache at the final
            # digest-keyed name (it would poison every later upload)
            tmp = os.path.join(derived_cache_dir,
                               f"{name}_{digest}.tmp{os.getpid()}.npy")
            try:
                np.save(tmp, arr)
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
            return arr

        n_blocks = fm.rank_checkpoints.shape[0]
        sigma = fm.symbol_count
        # plane reduction: only ceil(log2 sigma) planes carry information —
        # a Block3<u64> index over ACGT needs 2 device planes, not 3 (the
        # upper blob planes are all-zero for symbols < 2^p).  Shrinks the
        # fused table (and every rank gather) by (P-p)/(sigma/lanes+P).
        planes_eff = min(kind.num_planes, max(1, (sigma - 1).bit_length()))
        width = sigma + planes_eff * kind.num_lanes

        def _build_fused():
            fused = np.empty((n_blocks, width), dtype=np.uint32)
            fused[:, :sigma] = fm.rank_checkpoints.astype(np.uint32)
            fused[:, sigma:] = np.ascontiguousarray(
                fm.lanes[:, :planes_eff, :]).reshape(n_blocks, -1)
            return fused

        if ckpt_derive == "auto":
            ckpt_derive = jax.default_backend() == "tpu"

        # int32, not uint8: gathers from sub-word tables hang the TPU
        # compiler (axon); a 1 KiB table costs nothing widened.
        if isinstance(fm.encoder, EncodingTable):
            enc_table = fm.encoder.table.astype(np.int32)
            enc_identity = False
            enc_default = int(np.bincount(enc_table, minlength=1).argmax())
            enc_pairs = tuple(
                (int(v), int(enc_table[v]))
                for v in range(256) if enc_table[v] != enc_default
            )
        else:
            enc_table = np.arange(256, dtype=np.int32)
            enc_identity = True
            enc_default = 0
            enc_pairs = ()

        from ..build.dense_lut import auto_dense_k, dense_lut

        dk = auto_dense_k(sigma, fm.kmer_size, dense_lut_entries or 0,
                          text_len=fm.text_len)
        dk_host = min(dk, max(auto_dense_k(sigma, fm.kmer_size,
                                           dense_host_entries,
                                           text_len=fm.text_len),
                              fm.kmer_size + 1)) if dk else 0
        if dk:
            d_lo = d_hi = None
            if dense_lut_cache is not None:
                try:
                    with np.load(dense_lut_cache) as z:
                        # dk AND content digest must match: a cache from a
                        # different text would silently mis-seed every query
                        if int(z["dk"]) == dk_host and "digest" in z.files \
                                and str(z["digest"]) == content_digest:
                            d_lo, d_hi = z["lo"], z["hi"]
                except (OSError, KeyError):
                    pass
            if d_lo is None:
                d_lo, d_hi = dense_lut(fm, dk_host)
                if dense_lut_cache is not None:
                    np.savez(dense_lut_cache, dk=dk_host, lo=d_lo, hi=d_hi,
                             digest=content_digest)
        else:
            d_lo = d_hi = np.zeros(1, dtype=np.uint32)

        from ..ops import stream_join

        if stream_tile is None:
            stream_tile = IndexMeta.stream_tile
        use_stream_engine = stream and sigma <= 63
        # 2-step pair table: two pattern symbols per stream pass
        # (build/pair_table.py) — halves the sort + kernel-pass count that
        # dominates mid-size batches.  sigma^2 must fit the kernel's
        # symbol budget.
        use_pair = pair and use_stream_engine and sigma * sigma <= 63
        meta = IndexMeta(
            sigma=sigma,
            kmer_size=fm.kmer_size,
            sampling_ratio=fm.sampling_ratio,
            block_len=kind.block_len,
            num_planes=planes_eff,
            num_lanes=kind.num_lanes,
            dense_k=dk,
            stream_rows=stream_join.stream_table_rows(
                sigma, fm.text_len, stream_tile) if use_stream_engine else 0,
            stream_tile=stream_tile,
            pair_rows=stream_join.stream_table_rows(
                sigma * sigma, fm.text_len, stream_tile) if use_pair else 0,
            pair_gather=bool(pair_gather and use_pair),
            enc_identity=enc_identity,
            enc_pairs=enc_pairs,
            enc_default=enc_default,
            has_sa_full=(sa_full is not None) or sa_device_fill,
        )

        put = functools.partial(jax.device_put, device=device)
        import sys
        import time as _time

        trace = os.environ.get("SVIEW_UPLOAD_TRACE") == "1"
        t_tr = [_time.time()]

        def _tr(label, *arrs):
            if not trace:
                return
            for a in arrs:
                jax.block_until_ready(a)
            now = _time.time()
            print(f"[upload] {label}: {now - t_tr[0]:.1f}s",
                  file=sys.stderr, flush=True)
            t_tr[0] = now

        if ckpt_derive:
            # upload ONLY the plane columns (half the fused bytes through
            # the tunnel); the checkpoint columns are derived on device
            from ..ops.rank import derive_fused_device

            planes_host = np.ascontiguousarray(
                fm.lanes[:, :planes_eff, :]).reshape(n_blocks, -1)
            fused_dev = derive_fused_device(meta, put(planes_host),
                                            fm.text_len)
        else:
            fused_dev = put(_cached(f"fused{planes_eff}", _build_fused))
        count_dev = put(fm.count_array.astype(np.uint32))
        sent_dev = put(np.uint32(fm.sentinel_index))
        _tr("fused+small put", fused_dev, count_dev)
        # issue EVERY remaining host->device transfer NOW: device_put is
        # async, so the ~30 MB/s tunnel moves these bytes while the
        # derivation programs below (stream reshape, pair build, SA fill,
        # dense extension) occupy the chip — previously each upload was
        # issued right before its consumer and the cold path was strictly
        # serial (VERDICT r4 #4).
        kmer_dev = put(fm.kmer_count_table.astype(np.uint32, copy=False))
        enc_dev = put(enc_table)
        dlo_dev, dhi_dev = put(d_lo), put(d_hi)
        sa_up = sa_dev = None
        if sa_device_fill:
            ratio = max(int(sa_fill_ratio), 1)
            sa_up = put(np.ascontiguousarray(
                fm.suffix_array[::ratio]).astype(np.uint32))
        elif sa_full is not None:
            sa_dev = put(sa_full.astype(np.uint32, copy=False))
        else:
            # copy=False: for u32-position blobs the view is already
            # uint32 — the default astype copy costs ~2 GB of RAM traffic
            # in the CPU-backend one-shot path for nothing
            sa_dev = put(fm.suffix_array.astype(np.uint32, copy=False))

        if use_stream_engine:
            if stream_derive:
                stream_dev = stream_join.derive_stream_table(
                    meta, fused_dev, fm.text_len, stream_tile)
                if device is not None:
                    stream_dev = jax.device_put(stream_dev, device)
            else:
                def _build_stream():
                    bwt = stream_join.bwt_from_planes(
                        np.ascontiguousarray(fm.lanes), kind.num_planes,
                        fm.text_len)
                    return stream_join.build_stream_table(sigma, bwt,
                                                          stream_tile)

                # cache key embeds the v3 layout (RW rows, G grouping): a
                # cache written by an older layout must never be served to
                # the current kernel (wrong ranks / shapes)
                rw_, g_ = stream_join._layout(sigma, stream_tile)
                stream_dev = put(_cached(
                    f"streamv3rw{rw_}g{g_}_{stream_tile}", _build_stream))
        else:
            stream_dev = put(np.zeros((stream_join._layout(
                sigma, stream_tile)[0], stream_tile),
                                      np.int32))
        _tr("stream table", stream_dev)

        if use_pair:
            from ..build.pair_table import build_pair_table_device

            pair_tbl, pair_gtbl, pair_c2, pair_fix = build_pair_table_device(
                meta, fused_dev, count_dev, sent_dev, fm.text_len,
                stream_tile, want_gather=meta.pair_gather)
        else:
            pair_tbl = put(np.zeros((8, stream_tile), np.int32))
            pair_gtbl = put(np.zeros((1, 8), np.uint32))
            pair_c2 = put(np.zeros(max(sigma * sigma, 1), np.uint32))
            pair_fix = put(np.array([0xFFFFFFFF, 0], np.uint32))
        _tr("pair table", pair_tbl)

        # SA fill runs BEFORE the dense extension: the fill's 4 GB output
        # buffer plus its sort transients are the peak HBM moment of the
        # cold path, and the dk>dk_host extension would add another ~2 GB
        # of dense tables to the resident set during it (measured: the
        # same fill is ~2x slower with the full table set resident).
        if sa_device_fill:
            from ..build.sa_fill import fill_sa_full_device

            ratio = max(int(sa_fill_ratio), 1)
            sa_dev = fill_sa_full_device(
                meta, fused_dev, count_dev, sent_dev, sa_up,
                fm.text_len, fm.sampling_ratio * ratio,
                stream_tbl=stream_dev,
                use_stream=(use_stream_engine
                            and jax.default_backend() == "tpu"))
            sa_up = None  # free the strided upload before the dense tables
        _tr("sa fill", sa_dev)

        if dk and dk > dk_host:
            from ..build.dense_lut import extend_dense_lut_device

            dlo_dev, dhi_dev = extend_dense_lut_device(
                meta, fused_dev, np.asarray(fm.count_array, dtype=np.uint32),
                sent_dev, dlo_dev, dhi_dev, dk - dk_host)
        _tr("dense extension", dlo_dev)
        return cls(
            fused=fused_dev,
            kmer_tbl=kmer_dev,
            dense_lo=dlo_dev,
            dense_hi=dhi_dev,
            count_arr=count_dev,
            sa=sa_dev,
            sentinel=sent_dev,
            enc_table=enc_dev,
            stream_tbl=stream_dev,
            pair_tbl=pair_tbl,
            pair_gtbl=pair_gtbl,
            pair_c2=pair_c2,
            pair_fix=pair_fix,
            seg_base=put(np.zeros((2, 1), np.uint32)),
            meta=meta,
        )

    # ------------------------------------------------------------------
    @classmethod
    def _from_host_wide(cls, fm, device=None, stream: bool = True,
                        dense_host_entries: int = 1 << 20
                        ) -> "DeviceFmIndex":
        """Upload with two-lane u32 position values (texts >= 2^32).

        The reference's u64 ``Position`` (``text_length.rs:87-129``) on a
        32-bit device ISA: value arrays split into (hi, lo) uint32 lanes,
        block indices stay uint32 (valid to 2^38 bp).  Any sampling ratio
        1..2^15 is supported (``ops.wide.p_divmod_const``); batches are
        served by the wide STREAM engine (blkkey sort-join kernel +
        segment-local checkpoints, ``ops/wide.py``) up to
        ``STREAM_WIDE_MAX_LANES`` lanes, gather engine beyond.
        """
        kind = fm.block
        if fm.text_len >= 2**38:
            raise BuildError("wide device path requires text_len < 2^38 "
                             "(block indices must fit uint32)")
        if len(fm.kmer_count_table) >= 2**31:
            raise BuildError("kmer table too large for int32 device indexing")
        r = fm.sampling_ratio
        if r < 1 or r > (1 << 15):
            raise BuildError(
                "wide device path requires 1 <= sampling_ratio <= 2^15 "
                "(p_divmod_const envelope)")
        # the locate walk's SA fold and _split_pos_wide's block fold pack
        # the two-lane position into ONE uint32 index (ops/wide.py); both
        # wrap unless n/r and n/block_len fit uint32.  Validate the REAL
        # envelope, not just the 2^38 block bound (a block_len=32 text in
        # [2^37, 2^38) or an r=2 text >= 2^33 would silently wrap).
        bound = min(r, kind.block_len) << 32
        if fm.text_len >= bound:
            raise BuildError(
                f"wide device path requires text_len < min(sampling_ratio,"
                f" block_len) * 2^32 = {bound} (the SA and block index "
                f"folds are uint32); got text_len {fm.text_len}")

        n_blocks = fm.rank_checkpoints.shape[0]
        sigma = fm.symbol_count
        planes_eff = min(kind.num_planes, max(1, (sigma - 1).bit_length()))
        width = 2 * sigma + planes_eff * kind.num_lanes
        fused = np.empty((n_blocks, width), dtype=np.uint32)
        ck = fm.rank_checkpoints.astype(np.uint64)
        fused[:, :sigma] = (ck >> np.uint64(32)).astype(np.uint32)
        fused[:, sigma : 2 * sigma] = (ck & np.uint64(0xFFFFFFFF)).astype(
            np.uint32)
        fused[:, 2 * sigma :] = np.ascontiguousarray(
            fm.lanes[:, :planes_eff, :]).reshape(n_blocks, -1)

        def split2(a):
            a = np.asarray(a, dtype=np.uint64)
            return np.stack([(a >> np.uint64(32)).astype(np.uint32),
                             (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)])

        all_lo = fm.text_len <= 0xFFFFFFFF  # every position value < 2^32

        def put2(a):
            """2-lane upload; when every value fits the low lane (a
            force_wide run on a < 4 Gbp text) the hi lane is built on
            device instead of shipping GBs of zeros through the tunnel."""
            if not all_lo:
                return put(split2(a))
            lo = put(np.asarray(a).astype(np.uint32))
            return jnp.concatenate([jnp.zeros_like(lo)[None], lo[None]])

        if isinstance(fm.encoder, EncodingTable):
            enc_table = fm.encoder.table.astype(np.int32)
            enc_identity = False
            enc_default = int(np.bincount(enc_table, minlength=1).argmax())
            enc_pairs = tuple(
                (int(v), int(enc_table[v]))
                for v in range(256) if enc_table[v] != enc_default)
        else:
            enc_table = np.arange(256, dtype=np.int32)
            enc_identity = True
            enc_default = 0
            enc_pairs = ()

        from ..ops import stream_join
        from ..build.dense_lut import auto_dense_k, dense_lut

        use_stream_engine = stream and sigma <= 63
        stream_tile = IndexMeta.stream_tile
        # dense seeds: HOST-built only (the on-device extension pass is a
        # narrow-engine program); dk10 at DNA scale costs ~4 s host-side
        # and cuts a 20 bp search from 17 LF passes to 10
        dk = auto_dense_k(sigma, fm.kmer_size, dense_host_entries or 0,
                          text_len=fm.text_len)
        meta = IndexMeta(
            sigma=sigma, kmer_size=fm.kmer_size, sampling_ratio=r,
            block_len=kind.block_len, num_planes=planes_eff,
            num_lanes=kind.num_lanes, wide_pos=True,
            dense_k=dk,
            stream_rows=stream_join.stream_table_rows(
                sigma, fm.text_len, stream_tile) if use_stream_engine else 0,
            stream_tile=stream_tile,
            enc_identity=enc_identity, enc_pairs=enc_pairs,
            enc_default=enc_default,
        )
        put = functools.partial(jax.device_put, device=device)
        fused_dev = put(fused)
        if use_stream_engine:
            stream_dev, seg_base = stream_join.derive_stream_table_wide(
                meta, fused_dev, fm.text_len, stream_tile)
            if device is not None:
                stream_dev = jax.device_put(stream_dev, device)
                seg_base = jax.device_put(seg_base, device)
        else:
            stream_dev = put(np.zeros((8, stream_tile), np.int32))
            seg_base = put(np.zeros((2, 1), np.uint32))
        if dk:
            d_lo, d_hi = dense_lut(fm, dk, wide=True)
            dlo_dev, dhi_dev = put2(d_lo), put2(d_hi)
        else:
            dlo_dev = put(np.zeros((2, 1), np.uint32))
            dhi_dev = put(np.zeros((2, 1), np.uint32))
        return cls(
            fused=fused_dev,
            kmer_tbl=put2(fm.kmer_count_table),
            dense_lo=dlo_dev,
            dense_hi=dhi_dev,
            count_arr=put2(fm.count_array),
            sa=put2(fm.suffix_array),
            sentinel=put(split2(np.array([fm.sentinel_index]))[:, 0]),
            enc_table=put(enc_table),
            stream_tbl=stream_dev,
            pair_tbl=put(np.zeros((8, stream_tile), np.int32)),
            pair_gtbl=put(np.zeros((1, 8), np.uint32)),
            pair_c2=put(np.zeros(max(sigma * sigma, 1), np.uint32)),
            pair_fix=put(np.array([0xFFFFFFFF, 0], np.uint32)),
            seg_base=seg_base,
            meta=meta,
        )

    # ------------------------------------------------------------------
    # Exactly TWO jit programs serve every query: _ranges_jit (backward
    # search -> [lo, hi), counts = hi - lo; shared by count and locate)
    # and _resolve_jit (range expansion + row resolution).  Keeping them
    # SEPARATE is a measured decision: fusing search+resolve into one
    # XLA program produced wildly unstable schedules on TPU (the same
    # resolve work cost 34 ms in one compiled composition and 495 ms in
    # another — see DESIGN.md perf notes); two dispatches cost ~100 us
    # and make each phase's cost predictable.

    # streaming sort-join engages above this batch size — the measured
    # crossover on a v5e at 1 Gbp/dk14 (count Mq/s, gather vs stream):
    # 8k: 1.10/0.59, 16k: 1.56/1.05, 32k: 1.84/1.93, 64k: 2.01/3.04,
    # 128k: 2.10/4.69.  (A pair GATHER-layout table was measured too:
    # its 128 B row gathers cost ~3x a fused-row gather, losing to the
    # pair stream engine at every batch size — it stays opt-in.)
    STREAM_MIN_BATCH = 32768
    # above this lane count one batch no longer fits the per-step sort
    # budget; the gather engine serves it (correct, ~3x slower).  NOT a
    # silent cap: crossing it warns, and ``engine_for`` reports the choice.
    STREAM_MAX_BATCH = 1 << 25

    def _stream(self, B: int, use_stream: bool | None) -> bool:
        if self.meta.stream_rows == 0:
            return False
        if B >= self.STREAM_MAX_BATCH:
            if use_stream is None or use_stream:
                import warnings

                warnings.warn(
                    f"batch of {B} lanes exceeds the stream engine's "
                    f"{self.STREAM_MAX_BATCH}-lane sort budget; serving it "
                    "with the gather engine (~3x slower at this size). "
                    "Chunk the batch — ~1M lanes per call is the measured "
                    "throughput sweet spot on a v5e.",
                    RuntimeWarning, stacklevel=3)
            return False
        if use_stream is None:
            return B >= self.STREAM_MIN_BATCH
        return use_stream

    def engine_for(self, B: int, use_stream: bool | None = None,
                   use_pair: bool = True) -> str:
        """The engine a batch of ``B`` lanes will be served by:
        ``'wide-gather'`` | ``'gather'`` | ``'stream'`` | ``'pair-stream'``.
        Exposed so callers (and tests) can observe the stream->gather
        fallback above ``STREAM_MAX_BATCH`` instead of inferring it from
        throughput."""
        if self.meta.wide_pos:
            return ("wide-stream" if self._stream_wide(B, use_stream)
                    else "wide-gather")
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            stream = self._stream(B, use_stream)
        if not stream:
            return "gather"
        return "pair-stream" if (use_pair and self.meta.pair_rows) else "stream"

    def _stream_wide(self, B: int, use_stream: bool | None) -> bool:
        """Wide batches use the blkkey stream engine while 2B lanes fit
        the 18-bit payload budget (ops.wide.STREAM_WIDE_MAX_LANES);
        beyond it the gather engine serves them, with a warning (chunk
        the batch)."""
        from ..ops.wide import STREAM_WIDE_MAX_LANES

        if self.meta.stream_rows == 0 or use_stream is False:
            return False
        if 2 * B >= STREAM_WIDE_MAX_LANES:
            if use_stream:
                import warnings

                warnings.warn(
                    f"wide batch of {B} patterns exceeds the wide stream "
                    f"engine's payload budget ({STREAM_WIDE_MAX_LANES // 2}"
                    " patterns); serving it with the gather engine. Chunk "
                    "the batch.", RuntimeWarning, stacklevel=3)
            return False
        return True

    def count(self, patterns, lens=None, use_stream: bool | None = None,
              use_pair: bool = True) -> jax.Array:
        """counts uint32 [B] for a [B, Lmax] uint8 batch (raw bytes for
        EncodingTable indexes, symbol indices for PassThrough).

        ``use_pair=False`` forces the single-symbol engines (parity gates
        need a path independent of the pair tables).  Wide (u64-position)
        indexes return uint32 [2, B] — (hi, lo) lanes; combine with
        ``ops.wide.combine64``."""
        patterns, lens, steps, facts = _as_batch(self.meta, patterns, lens)
        if self.meta.wide_pos:
            return _wide_counts_jit(
                self, patterns, lens, steps,
                self._stream_wide(patterns.shape[0], use_stream), facts[1])
        lo, hi = _ranges_jit(self, patterns, lens, steps,
                             self._stream(patterns.shape[0], use_stream),
                             facts, use_pair)
        return hi - lo

    def pos_ranges(self, patterns, lens=None, use_stream: bool | None = None):
        """(lo, hi) uint32 [B]; wide indexes return the two-lane 4-tuple
        (lo_hi, lo_lo, hi_hi, hi_lo)."""
        patterns, lens, steps, facts = _as_batch(self.meta, patterns, lens)
        if self.meta.wide_pos:
            return _wide_ranges_jit(
                self, patterns, lens, steps,
                self._stream_wide(patterns.shape[0], use_stream), facts[1])
        return _ranges_jit(self, patterns, lens, steps,
                           self._stream(patterns.shape[0], use_stream), facts)

    def locate(self, patterns, lens=None, capacity: int | None = None,
               use_stream: bool | None = None, use_pair: bool = True):
        """Returns (locations uint32 [capacity], pattern_ids int32,
        valid bool, dropped uint32 [1]).

        Slot ``p < B`` is pattern p's first occurrence; slots ``B..`` hold
        the overflow (see ``ops.locate.expand_ranges``).  ``capacity`` is
        the static output budget (must be >= B); when None it is sized from
        the counts (overflow rounded to a power of two to bound recompiles).
        ``dropped`` counts overflow occurrences that did not fit the budget
        — callers passing an explicit ``capacity`` must check it is 0
        before treating the result as complete (no silent caps).
        """
        patterns, lens, steps, facts = _as_batch(self.meta, patterns, lens)
        if self.meta.wide_pos:
            from ..ops import wide as wide_ops

            wstream = self._stream_wide(patterns.shape[0], use_stream)
            bounds = _wide_ranges_jit(self, patterns, lens, steps, wstream,
                                      facts[1])
            if capacity is None:
                counts = wide_ops.combine64(*_pair_sub_jit(bounds))
                capacity = locate_ops.expand_capacity(counts)
            locs_h, locs_l, pids, valid, dropped = _wide_resolve_jit(
                self, bounds, capacity,
                wstream and capacity < wide_ops.STREAM_WIDE_MAX_LANES)
            return jnp.stack([locs_h, locs_l]), pids, valid, dropped
        stream = self._stream(patterns.shape[0], use_stream)
        lo, hi = _ranges_jit(self, patterns, lens, steps, stream, facts,
                             use_pair)
        if capacity is None:
            capacity = locate_ops.expand_capacity(np.asarray(hi - lo))
        locs, pids, valid, dropped = _resolve_jit(self, lo, hi, capacity, stream)
        return locs, pids, valid, dropped

    def locate_with_counts(self, patterns, lens=None, capacity: int | None = None,
                           use_stream: bool | None = None,
                           use_pair: bool = True):
        """(locs, pids, valid, counts, dropped) — two dispatches, zero host
        sync when ``capacity`` is given (``dropped`` stays on device).
        Wide indexes return locs/counts as uint32 [2, ...] lane pairs."""
        patterns, lens, steps, facts = _as_batch(self.meta, patterns, lens)
        if self.meta.wide_pos:
            from ..ops import wide as wide_ops

            wstream = self._stream_wide(patterns.shape[0], use_stream)
            bounds = _wide_ranges_jit(self, patterns, lens, steps, wstream,
                                      facts[1])
            counts = _wide_counts_from_bounds(bounds)
            if capacity is None:
                capacity = locate_ops.expand_capacity(
                    wide_ops.combine64(counts[0], counts[1]))
            locs_h, locs_l, pids, valid, dropped = _wide_resolve_jit(
                self, bounds, capacity,
                wstream and capacity < wide_ops.STREAM_WIDE_MAX_LANES)
            return (jnp.stack([locs_h, locs_l]), pids, valid, counts,
                    dropped)
        stream = self._stream(patterns.shape[0], use_stream)
        lo, hi = _ranges_jit(self, patterns, lens, steps, stream, facts,
                             use_pair)
        if capacity is None:
            capacity = locate_ops.expand_capacity(np.asarray(hi - lo))
        locs, pids, valid, dropped = _resolve_jit(self, lo, hi, capacity, stream)
        return locs, pids, valid, hi - lo, dropped

    def resolve_rows(self, lo, hi, capacity: int, use_stream: bool = False):
        """Expand [lo, hi) ranges and resolve rows to locations (the second
        locate executable, exposed for phase benchmarking).  Returns
        (locs, pids, valid, dropped)."""
        return _resolve_jit(self, lo, hi, capacity, use_stream)


def _as_batch(meta, patterns, lens):
    """Normalize the batch and derive STATIC facts about it host-side:
    ``(all_dense, fixed_len)`` — every lane long enough for the dense seed,
    and a single shared length — which strip per-element gathers from the
    compiled program (see ``ops.search``)."""
    if lens is None:
        np_pat = np.asarray(patterns, dtype=np.uint8)
        lens_host = np.full(
            np_pat.shape[0] if np_pat.ndim > 1 else 1, np_pat.shape[-1], np.int32
        )
    else:
        lens_host = np.asarray(lens, dtype=np.int32)
    patterns = jnp.asarray(patterns, dtype=jnp.uint8)
    if patterns.ndim == 1:
        patterns = patterns[None, :]
    steps = search_ops.max_steps_needed(meta, lens_host, patterns.shape[1])
    all_dense = bool(meta.dense_k) and lens_host.size > 0 and bool(
        (lens_host >= meta.dense_k).all())
    fixed_len = int(lens_host[0]) if (
        lens_host.size > 0 and (lens_host == lens_host[0]).all()) else None
    return patterns, jnp.asarray(lens_host), steps, (all_dense, fixed_len)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _wide_ranges_jit(idx: DeviceFmIndex, patterns, lens, steps: int,
                     use_stream: bool = False, fixed_len: int | None = None):
    from ..ops import wide as wide_ops

    sym = search_ops.encode_patterns(idx.enc_table, patterns, idx.meta)
    return wide_ops.pos_ranges_wide(
        idx.meta, idx.fused, idx.kmer_tbl, idx.count_arr, idx.sentinel,
        sym, lens, steps, stream_tbl=idx.stream_tbl, seg_base=idx.seg_base,
        use_stream=use_stream, dense_lo=idx.dense_lo, dense_hi=idx.dense_hi,
        fixed_len=fixed_len)


@jax.jit
def _wide_counts_from_bounds(bounds):
    from ..ops import wide as wide_ops

    lo_h, lo_l, hi_h, hi_l = bounds
    return jnp.stack(wide_ops.p_sub(hi_h, hi_l, lo_h, lo_l))


def _wide_counts_jit(idx, patterns, lens, steps, use_stream=False,
                     fixed_len=None):
    return _wide_counts_from_bounds(
        _wide_ranges_jit(idx, patterns, lens, steps, use_stream, fixed_len))


@jax.jit
def _pair_sub_jit(bounds):
    from ..ops import wide as wide_ops

    lo_h, lo_l, hi_h, hi_l = bounds
    return wide_ops.p_sub(hi_h, hi_l, lo_h, lo_l)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _wide_resolve_jit(idx: DeviceFmIndex, bounds, capacity: int,
                      use_stream: bool = False):
    from ..ops import wide as wide_ops

    lo_h, lo_l, hi_h, hi_l = bounds
    return wide_ops.locate_rows_wide(
        idx.meta, idx.fused, idx.count_arr, idx.sa, idx.sentinel,
        lo_h, lo_l, hi_h, hi_l, capacity, stream_tbl=idx.stream_tbl,
        seg_base=idx.seg_base, use_stream=use_stream)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _ranges_jit(idx: DeviceFmIndex, patterns, lens, steps: int,
                use_stream: bool = False, facts=(False, None),
                use_pair: bool = True):
    all_dense, fixed_len = facts
    sym = search_ops.encode_patterns(idx.enc_table, patterns, idx.meta)
    return search_ops.pos_ranges(
        idx.meta, idx.fused, idx.kmer_tbl, idx.dense_lo, idx.dense_hi,
        idx.count_arr, idx.sentinel, sym, lens, steps,
        stream_tbl=idx.stream_tbl, use_stream=use_stream,
        all_dense=all_dense, fixed_len=fixed_len,
        pair_tbl=idx.pair_tbl if use_pair else None,
        pair_c2=idx.pair_c2, pair_fix=idx.pair_fix,
        pair_gtbl=idx.pair_gtbl if use_pair else None,
    )


@functools.partial(jax.jit, static_argnums=(2,))
def _expand_jit(lo, hi, capacity: int):
    return locate_ops.expand_ranges(lo, hi, capacity)


@jax.jit
def _sa_gather_jit(sa, rows, valid):
    # rows stay uint32 (int32 would overflow for text_len in [2^31, 2^32))
    return jnp.where(valid, jnp.take(sa, rows), jnp.uint32(0))


@functools.partial(jax.jit, static_argnums=(0, 3))
def _walk_jit(meta, fused, count_arr, use_stream: bool, sa, sentinel, rows,
              valid, stream_tbl):
    return locate_ops.walk_rows(meta, fused, count_arr, sa, sentinel, rows,
                                valid, stream_tbl=stream_tbl,
                                use_stream=use_stream)


def _resolve_jit(idx: DeviceFmIndex, lo, hi, capacity: int,
                 use_stream: bool = False):
    """Locate's resolution phase, deliberately SPLIT into small dispatches
    (expand, then sa-gather or LF-walk): one fused resolve program drew a
    fast or slow XLA schedule at random across recompiles (measured 40 vs
    80 ms for identical B=1M work); the small programs compile predictably
    and their ~0.1 ms dispatch overhead is noise.  The static meta for the
    walk is stripped of seed-table fields it never reads (dense_k) so a
    different dense depth still hits the same compiled program.
    """
    rows, pids, valid, dropped = _expand_jit(lo, hi, capacity)
    if idx.meta.has_sa_full:
        locs = _sa_gather_jit(idx.sa, rows, valid)
    else:
        meta = dataclasses.replace(idx.meta, dense_k=0, pair_rows=0)
        locs = _walk_jit(meta, idx.fused, idx.count_arr, use_stream, idx.sa,
                         idx.sentinel, rows, valid, idx.stream_tbl)
    return locs, pids, valid, dropped
