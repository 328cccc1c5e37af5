"""Device-mesh helpers for the 1-D row-partition distribution.

The reference's only parallelism is TBB shared-memory threading over
matrix rows (reference include/sparse_matrix_math.h:1493-1497); the
TPU-native scaling axis is the same row dimension, laid out over a 1-D
``jax.sharding.Mesh`` (SURVEY §2.3).  All collectives (psum for dots,
all_gather for the multiplicand halo) ride ICI along this axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

__all__ = ["ROW_AXIS", "make_mesh", "row_sharding", "replicated_sharding"]

ROW_AXIS = "rows"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    axis: str = ROW_AXIS,
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """A 1-D mesh over ``n_devices`` (default: all available devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} available"
                )
            devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (axis,))


def row_sharding(mesh: jax.sharding.Mesh, *, axis: str = ROW_AXIS):
    """NamedSharding that splits an array's leading dim across the mesh."""
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))


def replicated_sharding(mesh: jax.sharding.Mesh):
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
