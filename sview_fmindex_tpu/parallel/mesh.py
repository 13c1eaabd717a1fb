"""Mesh helpers for pattern-data-parallel query scaling."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None, devices=None, axis: str = DP_AXIS) -> Mesh:
    """1-D device mesh over the pattern-batch axis.

    The FM-index workload has one natural parallel axis — patterns (SURVEY.md
    §2 parallelism inventory); the index itself is replicated (range-sharding
    is a separate, optional layout).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
