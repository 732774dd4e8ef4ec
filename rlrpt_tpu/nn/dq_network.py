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


def dq_apply_relative(params: DQNetworkParams, verts_flat: jnp.ndarray,
                      positions: jnp.ndarray) -> jnp.ndarray:
    """Q-values for the relative-vertex encoding WITHOUT materialising it.

    The reference feeds the network `verts_flat - tile(p)` per ray, storing a
    (rays, 3*T) buffer on device (~700 MB at 720^2, ref:
    neural_q_pathtracer.cu:92-96 + nn_rendering_helpers.cu:281-298).  But the
    first layer is affine in that encoding, so

        W @ (verts - tile(p)) + b  ==  (W @ verts + b) - W3 @ p,

    where W3[:, k] = sum_t W[:, 3t+k] — the O(rays * 3*T) input never needs
    to exist.  Parameter shapes (and checkpoints) stay identical to the
    reference's 3*T-input layer; autodiff through this factored form yields
    exactly the same gradients as the materialised encoding.

    verts_flat: (3*T,); positions: (R, 3) -> (R, n_actions).
    """
    first = params.layers[0]
    base = first.w @ verts_flat + first.b                       # (out,)
    w3 = first.w.reshape(first.w.shape[0], -1, 3).sum(axis=1)   # (out, 3)
    h = jax.nn.relu(base[None, :] - positions @ w3.T)
    for layer in params.layers[1:]:
        h = fc_apply(layer, h, activation=RELU)
    return h
