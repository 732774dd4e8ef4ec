"""Multi-host execution helpers.

The reference has no distributed layer (SURVEY §5.8); this is the
TPU-native one.  A multi-host run is the SAME program as single-host —
`jax.distributed.initialize()` first, then the mesh in `parallel.mesh`
simply spans every process's devices and the shard_map renderers in
`parallel.dp` run unchanged (psums ride ICI within a slice, DCN between
slices).  The only host-side extras are global-array construction from
per-host shards and final image assembly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough (no-op if already up or
    single-process with no coordinator given)."""
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        # Rely on cluster auto-detection (TPU pods set the env for us);
        # single-process runs just skip.
        try:
            jax.distributed.initialize()
        except Exception:
            return
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def assemble_image(img) -> np.ndarray:
    """Fetch a (possibly cross-host sharded) image to every host.

    Single-host: a plain device_get.  Multi-host: an allgather of the
    addressable shards (the reference's 'final image assembly' has no
    counterpart — its cudaMemcpy D2H is this line).
    """
    img = jnp.asarray(img)
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(img))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(img, tiled=True))


def host_local_slice(n: int) -> slice:
    """The [start, stop) range of a length-n global axis owned by this
    process under equal sharding."""
    per = n // jax.process_count()
    p = jax.process_index()
    return slice(p * per, (p + 1) * per if p < jax.process_count() - 1 else n)
