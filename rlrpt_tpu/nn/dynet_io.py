"""DyNet text-format model (de)serialisation.

The reference checkpoints its DQN with dynet::TextFileSaver/Loader
(ref: neural_q_pathtracer.cu:55-59, 191-196; format visible in
Radiance_Map_Data/cornell_12_12.model):

    #Parameter# /_N {rows,cols} BYTELEN FLAGS
    <prod(dims) ASCII floats on one line>

where BYTELEN is the byte length of the data line INCLUDING its trailing
newline — NOT the element count (verified against the shipped
cornell_12_12.model: header ``{200,342} 1094401`` = 68,400 floats x 16
chars ("%+.8e" + one space, including a trailing space before the
newline) + 1).  Matrices are stored column-major (Eigen/DyNet layout);
parameter order is W1, b1, W2, b2, ... matching DQNetwork::initialize's
add_parameters calls.  Implementing this format exactly lets our models
be exchanged with the reference's shipped .model files for direct parity
runs (tested round-trip on cornell_12_12.model itself).
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
            flat = arr.flatten(order="F")
            # DyNet writes every value followed by one space (trailing
            # space included); the header's 4th field is the byte length
            # of that data line plus its newline.
            data = "".join(f"{v:+.8e} " for v in flat)
            f.write(f"#Parameter# /_{i} {dims} {len(data) + 1} ZERO_GRAD\n")
            f.write(data + "\n")


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
            byte_len = int(parts[3])  # data-line bytes incl. newline
            line = f.readline()
            n_expected = int(np.prod(dims))
            vals = np.fromstring(line, dtype=np.float32, sep=" ")
            if vals.size != n_expected:
                raise ValueError(
                    f"expected {n_expected} values for dims {dims}, "
                    f"got {vals.size}")
            n_bytes = len(line) if line.endswith("\n") else len(line) + 1
            if n_bytes != byte_len:
                raise ValueError(
                    f"data line is {n_bytes} bytes, header says "
                    f"{byte_len}")
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
