"""Shared device-timing helpers for every bench surface.

The forcing idiom is TPU-timing-critical and easy to get wrong in two
directions: per-result ``block_until_ready`` acks early on the axon
backend, and a full-array ``np.asarray`` pull times the host tunnel
instead of the chip.  ``force`` materializes a data-dependent 4-byte
slice per output leaf — the slice is dispatched after the producing
program, so pulling it proves the program ran, at negligible transfer
cost.
"""
from __future__ import annotations

import time

import numpy as np


def force(x) -> None:
    """Force execution of a (pytree of) device array(s)."""
    import jax

    for leaf in jax.tree.leaves(x):
        np.asarray(leaf[-1:] if getattr(leaf, "ndim", 0) else leaf)


def timeit(fn, *args, reps: int = 8):
    """(warmup_s, steady_s): compile+first-run cost, then pipelined steady
    state — all reps enqueued back-to-back, every result forced at the
    end (per-rep forcing would serialize the pipeline)."""
    t0 = time.perf_counter()
    force(fn(*args))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        force(o)
    return warm, (time.perf_counter() - t0) / reps
