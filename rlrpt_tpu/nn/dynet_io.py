"""DyNet text-format model (de)serialisation.

The reference checkpoints its DQN with dynet::TextFileSaver/Loader
(ref: neural_q_pathtracer.cu:55-59, 191-196; format visible in
Radiance_Map_Data/cornell_12_12.model):

    #Parameter# /_N {rows,cols} size FLAGS
    <size ASCII floats on one line>

Matrices are stored column-major (Eigen/DyNet layout); parameter order is
W1, b1, W2, b2, ... matching DQNetwork::initialize's add_parameters calls.
Implementing this format lets our models be exchanged with the reference's
shipped .model files for direct parity runs.
"""

from __future__ import annotations

import numpy as np

from rlrpt_tpu.nn.dq_network import DQNetworkParams
from rlrpt_tpu.nn.fc_layer import FCParams

import jax.numpy as jnp


def save_dynet_model(params: DQNetworkParams, path: str) -> None:
    arrays: list[np.ndarray] = []
    for layer in params.layers:
        arrays.append(np.asarray(layer.w))
        arrays.append(np.asarray(layer.b))
    with open(path, "w") as f:
        for i, arr in enumerate(arrays):
            dims = "{" + ",".join(str(d) for d in arr.shape) + "}"
            f.write(f"#Parameter# /_{i} {dims} {arr.size} ZERO_GRAD\n")
            flat = arr.flatten(order="F")
            f.write(" ".join(f"{v:+.8e}" for v in flat) + "\n")


def load_dynet_arrays(path: str) -> list[np.ndarray]:
    """Parse a DyNet text model into a list of numpy arrays."""
    arrays: list[np.ndarray] = []
    with open(path) as f:
        while True:
            header = f.readline()
            if not header:
                break
            header = header.strip()
            if not header:
                continue
            if not header.startswith("#"):
                raise ValueError(f"bad dynet header: {header[:60]}")
            parts = header.split()
            dims = tuple(int(d) for d in parts[2].strip("{}").split(","))
            size = int(parts[3])
            vals = np.fromstring(f.readline(), dtype=np.float32, sep=" ")
            if vals.size != size:
                raise ValueError(f"expected {size} values, got {vals.size}")
            arrays.append(vals.reshape(dims, order="F"))
    return arrays


def load_dynet_model(path: str) -> DQNetworkParams:
    arrays = load_dynet_arrays(path)
    if len(arrays) % 2 != 0:
        raise ValueError("expected W,b pairs")
    layers = []
    for i in range(0, len(arrays), 2):
        w, b = arrays[i], arrays[i + 1]
        layers.append(FCParams(w=jnp.asarray(w, jnp.float32),
                               b=jnp.asarray(b.reshape(-1), jnp.float32)))
    return DQNetworkParams(layers=tuple(layers))
