"""Unit tests for the level-layout range expansion (ops.locate).

The layout contract: slot p < B = pattern p's first occurrence (valid iff
count >= 1); slots B.. = overflow (2nd+ occurrences) in pattern order,
dropped beyond capacity.  See expand_ranges docstring.
"""
import numpy as np
import pytest

from sview_fmindex_tpu.ops.locate import expand_capacity, expand_ranges

U32 = np.uint32


def _run(lo, hi, cap):
    rows, pids, valid, _ = _run4(lo, hi, cap)
    return rows, pids, valid


def _run4(lo, hi, cap):
    import jax.numpy as jnp

    rows, pids, valid, dropped = expand_ranges(
        jnp.asarray(lo, jnp.uint32), jnp.asarray(hi, jnp.uint32), cap)
    return tuple(map(np.asarray, (rows, pids, valid, dropped)))


def _pairs(rows, pids, valid):
    return sorted(zip(pids[valid].tolist(), rows[valid].tolist()))


def test_exact_base_capacity_no_overflow_slots():
    lo = [5, 9, 9]
    hi = [6, 9, 12]  # counts 1, 0, 3
    rows, pids, valid = _run(lo, hi, 3)  # capacity == B: O = 0 branch
    assert valid.tolist() == [True, False, True]
    assert rows[0] == 5 and rows[2] == 9
    # 2nd+ occurrences of pattern 2 are dropped (no overflow room)
    assert _pairs(rows, pids, valid) == [(0, 5), (2, 9)]


def test_overflow_compaction_and_drop():
    lo = [100, 0, 50]
    hi = [105, 0, 52]  # counts 5, 0, 2
    # full capacity: all 7 hits
    rows, pids, valid = _run(lo, hi, expand_capacity(np.array([5, 0, 2])))
    assert _pairs(rows, pids, valid) == [
        (0, 100), (0, 101), (0, 102), (0, 103), (0, 104), (2, 50), (2, 51)]
    # capacity B+2: base rows + only the first 2 overflow rows survive
    rows, pids, valid = _run(lo, hi, 5)
    assert _pairs(rows, pids, valid) == [(0, 100), (0, 101), (0, 102), (2, 50)]


def test_capacity_below_batch_raises():
    with pytest.raises(ValueError, match="base slot"):
        _run([1, 2], [2, 3], 1)


def test_expand_capacity_sizing():
    counts = np.array([1, 1, 4, 0, 1])
    cap = expand_capacity(counts)
    assert cap >= 5 + 3  # B base slots + the 3 extras
    rows, pids, valid = _run([0, 10, 20, 30, 40],
                             [1, 11, 24, 30, 41], cap)
    assert int(valid.sum()) == int(counts.sum())


def test_dropped_counts_overflow_beyond_capacity():
    lo = [100, 0, 50]
    hi = [105, 0, 52]  # counts 5, 0, 2 -> 5 extras beyond the base slots
    # roomy capacity: nothing dropped
    *_, dropped = _run4(lo, hi, expand_capacity(np.array([5, 0, 2])))
    assert dropped.tolist() == [0]
    # capacity B+2: 3 of the 5 overflow rows don't fit
    *_, dropped = _run4(lo, hi, 5)
    assert dropped.tolist() == [3]
    # capacity == B (O = 0 branch): all 5 extras dropped
    *_, dropped = _run4(lo, hi, 3)
    assert dropped.tolist() == [5]


def test_huge_counts_do_not_wrap_cumsum():
    """Regression (round-3 advisor): shard-padding lanes are length-1
    patterns whose counts approach text_len; a plain uint32 cumsum of the
    extras wraps non-monotonic and corrupts the searchsorted.  The
    saturating scan must keep the valid early overflow slots exact."""
    big = 3_000_000_000  # 3 lanes x 3e9 extras > 2^32
    lo = np.array([7, 0, 0, 0, 20], dtype=np.uint64)
    hi = np.array([10, big, big, big, 21], dtype=np.uint64)
    rows, pids, valid, dropped = _run4(lo.astype(np.uint32),
                                       (hi % (1 << 32)).astype(np.uint32), 5 + 4)
    # pattern 0's two overflow rows (8, 9) must still be addressed exactly
    got = sorted(zip(pids[valid].tolist(), rows[valid].tolist()))
    assert (0, 8) in got and (0, 9) in got
    # ecum monotonic -> searchsorted sane: every overflow slot maps to a
    # real pattern and dropped saturates instead of wrapping
    assert int(dropped[0]) > 0
