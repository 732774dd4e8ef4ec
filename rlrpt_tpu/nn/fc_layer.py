"""Fully-connected layer — pure-JAX replacement of the reference's DyNet
FCLayer (ref: NN_Builders/fc_layer.cu): affine b + Wx, activation in
{LINEAR, RELU, SIGMOID, TANH, SOFTMAX}, optional dropout with a Bernoulli
mask at train time and retention scaling at eval time (fc_layer.cu:40-72 —
note the reference scales by (1 - p) at *eval*, DyNet-style; reproduced).

Parameters are Glorot/Xavier-uniform initialised, DyNet's default
(fc_layer.cu:29-35).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

LINEAR, RELU, SIGMOID, TANH, SOFTMAX = range(5)

_ACTIVATIONS = {
    LINEAR: lambda x: x,
    RELU: jax.nn.relu,
    SIGMOID: jax.nn.sigmoid,
    TANH: jnp.tanh,
    SOFTMAX: lambda x: jax.nn.softmax(x, axis=-1),
}


class FCParams(NamedTuple):
    w: jnp.ndarray  # (out, in) — DyNet stores W for W @ x
    b: jnp.ndarray  # (out,)


def fc_init(key, input_dim: int, output_dim: int,
            dtype=jnp.float32) -> FCParams:
    """Glorot-uniform init, gain matching DyNet's ParameterInitGlorot."""
    limit = math.sqrt(6.0 / (input_dim + output_dim))
    w = jax.random.uniform(key, (output_dim, input_dim), dtype,
                           minval=-limit, maxval=limit)
    return FCParams(w=w, b=jnp.zeros((output_dim,), dtype))


def fc_apply(params: FCParams, x: jnp.ndarray, activation: int = RELU,
             dropout: float = 0.0, training: bool = False,
             key=None) -> jnp.ndarray:
    """x: (..., in) -> (..., out).  The (batch, in) @ (in, out) contraction
    is the MXU hot path."""
    y = x @ params.w.T + params.b
    y = _ACTIVATIONS[activation](y)
    if dropout > 0.0:
        if training:
            keep = jax.random.bernoulli(key, 1.0 - dropout, y.shape)
            y = y * keep.astype(y.dtype)
        else:
            y = y * (1.0 - dropout)
    return y
