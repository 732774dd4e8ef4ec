"""Q-value probe extractor (mode 5).

TPU-native equivalent of save_selected_radiance_volumes_vals_nn
(ref: GPU_Rendering_Engine/Source/deep_learning/q_value_extractor.cu):
reads probe `x y z nx ny nz` lines from to_select.txt, evaluates the network
at each position, normalises the Q row by its sum (:42-48), and appends
`x y z nx ny nz q1..qS` rows to selected_deep.txt — the thesis's
distribution-visualisation data.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.nn.dq_network import DQNetworkParams, dq_apply_relative
from rlrpt_tpu.radiance.map_io import read_probe_points
from rlrpt_tpu.scene.scene import Scene


def probe_q_values(params: DQNetworkParams, scene: Scene,
                   positions: np.ndarray) -> np.ndarray:
    """Normalised Q rows for probe positions (N, 3) -> (N, S)."""
    q = np.asarray(dq_apply_relative(params, scene.vertices_flat,
                                     jnp.asarray(positions, jnp.float32)))
    total = q.sum(axis=-1, keepdims=True)
    total = np.where(total == 0.0, 1.0, total)
    return q / total


def save_selected_q_values_nn(params: DQNetworkParams, scene: Scene,
                              probe_path: str, out_path: str) -> None:
    """to_select.txt -> selected_deep.txt (ref: q_value_extractor.cu:75-123)."""
    locs, norms = read_probe_points(probe_path)
    q = probe_q_values(params, scene, locs)
    with open(out_path, "w") as f:
        for i in range(len(locs)):
            row = list(locs[i]) + list(norms[i]) + list(q[i])
            f.write(" ".join(f"{float(x):.6g}" for x in row) + "\n")
