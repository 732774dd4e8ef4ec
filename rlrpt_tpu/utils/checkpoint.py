"""Checkpoint / resume of full training state.

The reference checkpoints the DQN per frame in DyNet text format and the
tabular Q-table as text (SURVEY §5.4); both text formats are preserved in
nn.dynet_io / radiance.map_io for parity tooling.  This module adds the
orbax-style binary checkpoint of the WHOLE mid-training state — params,
optimiser state, epsilon, frame counter, radiance volumes — so a run can
resume exactly (the reference cannot: it loses Adam moments and epsilon).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from rlrpt_tpu.nn.dq_network import DQNetworkParams
from rlrpt_tpu.nn.fc_layer import FCParams
from rlrpt_tpu.radiance.volumes import RadianceVolumes


def _flatten(tree: Any, prefix: str, out: dict) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[prefix + "/treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}/{i}"] = np.asarray(leaf)


def save_training_state(path: str, params: DQNetworkParams, opt_state,
                        epsilon: float, frame: int,
                        vols: Optional[RadianceVolumes] = None) -> None:
    """Write a single-file .npz checkpoint."""
    out: dict = {"epsilon": np.float32(epsilon), "frame": np.int64(frame)}
    _flatten(params, "params", out)
    _flatten(opt_state, "opt", out)
    if vols is not None:
        out["vols/position"] = np.asarray(vols.position)
        out["vols/normal"] = np.asarray(vols.normal)
        out["vols/frame"] = np.asarray(vols.frame)
        out["vols/surface_lum"] = np.asarray(vols.surface_lum)
        out["vols/q"] = np.asarray(vols.q)
        out["vols/visits"] = np.asarray(vols.visits)
        out["vols/cdf"] = np.asarray(vols.cdf)
        out["vols/grid_resolution"] = np.int64(vols.grid_resolution)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **out)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def _unflatten(z, prefix: str, example: Any) -> Any:
    leaves = []
    i = 0
    while f"{prefix}/{i}" in z:
        leaves.append(z[f"{prefix}/{i}"])
        i += 1
    treedef = jax.tree_util.tree_structure(example)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_training_state(path: str, example_params: DQNetworkParams,
                        example_opt_state):
    """Read a checkpoint; returns (params, opt_state, epsilon, frame, vols).

    `example_*` provide the pytree structure (shapes are restored from the
    file).  `vols` is None when the checkpoint holds no tabular state.
    """
    import jax.numpy as jnp
    z = np.load(path)
    params = _unflatten(z, "params", example_params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = _unflatten(z, "opt", example_opt_state)
    opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
    vols = None
    if "vols/q" in z:
        vols = RadianceVolumes(
            position=jnp.asarray(z["vols/position"]),
            normal=jnp.asarray(z["vols/normal"]),
            frame=jnp.asarray(z["vols/frame"]),
            surface_lum=jnp.asarray(z["vols/surface_lum"]),
            q=jnp.asarray(z["vols/q"]),
            visits=jnp.asarray(z["vols/visits"]),
            cdf=jnp.asarray(z["vols/cdf"]),
            grid_resolution=int(z["vols/grid_resolution"]))
    return (params, opt_state, float(z["epsilon"]), int(z["frame"]), vols)
