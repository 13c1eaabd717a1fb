"""Dual SA-backend equivalence: native C++ SA-IS == numpy prefix-doubling.

The analog of the reference's crate-bio vs libdivsufsort test
(``burrow_wheeler_transform/mod.rs:15-64``): SA, BWT and pidx must agree
exactly for random texts across alphabets and sampling ratios.
"""
import numpy as np
import pytest

from sview_fmindex_tpu.build.bwt import bwt_and_sampled_sa
from sview_fmindex_tpu.build.suffix_array import suffix_array_numpy
from sview_fmindex_tpu.native import loader

pytestmark = pytest.mark.skipif(not loader.available(), reason="native lib not built")


def test_backends_agree_on_random_texts():
    rng = np.random.default_rng(11)
    for _ in range(100):
        k = int(rng.integers(1, 5))
        n = int(rng.integers(1, 500))
        s = np.concatenate(
            [rng.integers(1, k + 1, size=n).astype(np.uint8), [0]]
        ).astype(np.uint8)
        a = suffix_array_numpy(s)
        b = loader.suffix_array(np.ascontiguousarray(s))
        np.testing.assert_array_equal(a, b)


def test_bwt_pipeline_backends_agree():
    rng = np.random.default_rng(12)
    for ratio in (1, 2, 3):
        for _ in range(20):
            n = int(rng.integers(50, 300))
            enc = rng.integers(1, 4, size=n).astype(np.uint8)
            bwt_a, pidx_a, sa_a = bwt_and_sampled_sa(enc, ratio, sa_backend="numpy")
            bwt_b, pidx_b, sa_b = bwt_and_sampled_sa(enc, ratio, sa_backend="native")
            np.testing.assert_array_equal(bwt_a, bwt_b)
            assert pidx_a == pidx_b
            np.testing.assert_array_equal(sa_a, sa_b)


def test_native_rejects_bad_sentinel():
    s = np.array([2, 1, 0, 1, 0], dtype=np.uint8)  # 0 not unique/last-only
    with pytest.raises(RuntimeError):
        loader.suffix_array(s)


def test_single_char_and_tiny():
    for arr in ([0], [1, 0], [1, 1, 0], [2, 1, 0]):
        s = np.array(arr, dtype=np.uint8)
        np.testing.assert_array_equal(
            loader.suffix_array(s), suffix_array_numpy(s)
        )
