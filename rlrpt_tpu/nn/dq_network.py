"""The deep-Q irradiance network.

Pure-JAX replacement of the reference DQNetwork (NN_Builders/dq_network.cu:
8-50): an MLP input -> 200 -> 300 -> 200 -> n_actions with ReLU on every
layer *including the output* (the code is authoritative over the thesis
text — dq_network.cu:14-17).  Input is either the 3-D position
(TRAIN_ON_POSITION) or the relative-vertex encoding of size
scene.vertices_count (neural_q_pathtracer.cu:49).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from rlrpt_tpu.nn.fc_layer import RELU, FCParams, fc_apply, fc_init


class DQNetworkParams(NamedTuple):
    layers: tuple  # tuple[FCParams, ...]


def dq_init(key, input_dim: int, n_actions: int,
            hidden_sizes: Sequence[int] = (200, 300, 200),
            dtype=jnp.float32) -> DQNetworkParams:
    sizes = [input_dim, *hidden_sizes, n_actions]
    keys = jax.random.split(key, len(sizes) - 1)
    layers = tuple(fc_init(k, i, o, dtype)
                   for k, i, o in zip(keys, sizes[:-1], sizes[1:]))
    return DQNetworkParams(layers=layers)


def dq_apply(params: DQNetworkParams, x: jnp.ndarray) -> jnp.ndarray:
    """x: (..., input_dim) -> Q-values (..., n_actions), all-ReLU chain
    (ref: dq_network.cu:36-49; dropout is 0 for every layer there)."""
    h = x
    for layer in params.layers:
        h = fc_apply(layer, h, activation=RELU)
    return h
