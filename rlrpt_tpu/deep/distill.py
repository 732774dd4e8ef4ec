"""Offline supervised distillation of a SARSA Q-table into the DQN.

TPU-native equivalent of the standalone NN_Q_Value_Trainer binary
(ref: NN_Q_Value_Trainer/Source/main.cu): loads the dumped Q-table
(radiance_map_data.txt) + scene vertices (vertices.txt), shuffles, splits
80/20 (:126-157), then trains the same 3T->200->300->200->S network for 100
epochs at batch 128 with sum-of-squared-distance loss and Adam
(:184-239, settings.cuh:4-5), reporting per-epoch test MSE (:244-277).

The whole epoch (forward/loss/Adam over all minibatches) runs as one jitted
lax.scan; the relative-vertex encoding is factored (never materialised) via
dq_apply_relative.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlrpt_tpu.config import TrainerConfig
from rlrpt_tpu.nn.dq_network import DQNetworkParams, dq_apply_relative, dq_init
from rlrpt_tpu.radiance.map_io import load_radiance_map_data
from rlrpt_tpu.scene.scene import load_vertices_from_file


def load_training_data(q_table_path: str, vertices_path: str):
    """-> (verts_flat (3T,), positions (N,3), targets (N,S))."""
    pos, q, _ = load_radiance_map_data(q_table_path)
    verts = load_vertices_from_file(vertices_path)
    return verts, pos, q


def split_train_test(key, positions, targets, train_fraction: float = 0.8):
    """Shuffle + split (ref: main.cu:126-157)."""
    n = len(positions)
    perm = np.asarray(jax.random.permutation(key, n))
    n_train = int(n * train_fraction)
    tr, te = perm[:n_train], perm[n_train:]
    return (positions[tr], targets[tr]), (positions[te], targets[te])


@partial(jax.jit, static_argnames=("batch_size",))
def train_epoch(key, params, opt_state, verts_flat, positions, targets,
                batch_size: int, lr: float = 0.001):
    """One epoch of sequential minibatch Adam updates; returns
    (params, opt_state, summed train loss).  Loss per batch is
    sum(squared_distance) (ref: main.cu:234)."""
    optimizer = optax.adam(lr)
    n = positions.shape[0]
    b = min(batch_size, n)
    pad = (-n) % b
    perm = jax.random.permutation(key, n)
    pos_p = jnp.concatenate([positions[perm],
                             jnp.zeros((pad, 3), positions.dtype)])
    tgt_p = jnp.concatenate([targets[perm],
                             jnp.zeros((pad, targets.shape[1]), targets.dtype)])
    mask = jnp.concatenate([jnp.ones((n,), jnp.float32),
                            jnp.zeros((pad,), jnp.float32)])
    nb = (n + pad) // b
    chunks = (pos_p.reshape(nb, b, 3), tgt_p.reshape(nb, b, -1),
              mask.reshape(nb, b))

    def step(carry, chunk):
        p, o = carry
        c_pos, c_tgt, c_mask = chunk

        def loss_fn(pp):
            pred = dq_apply_relative(pp, verts_flat, c_pos)
            return jnp.sum(c_mask[:, None] * (pred - c_tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                               chunks)
    return params, opt_state, jnp.sum(losses)


@jax.jit
def eval_mse(params, verts_flat, positions, targets):
    """Mean per-example summed squared error (ref: main.cu:244-277)."""
    pred = dq_apply_relative(params, verts_flat, positions)
    return jnp.mean(jnp.sum((pred - targets) ** 2, axis=-1))


def distill(q_table_path: str, vertices_path: str,
            cfg: TrainerConfig = TrainerConfig(), seed: int = 0,
            hidden_sizes=(200, 300, 200), verbose: bool = False):
    """Full offline training run; returns (params, history list of
    (epoch, train_loss, test_mse))."""
    verts, pos, q = load_training_data(q_table_path, vertices_path)
    key = jax.random.PRNGKey(seed)
    k_split, k_init, k_train = jax.random.split(key, 3)
    (tr_pos, tr_q), (te_pos, te_q) = split_train_test(
        k_split, pos, q, cfg.train_fraction)

    params = dq_init(k_init, len(verts), q.shape[1], hidden_sizes)
    opt_state = optax.adam(cfg.learning_rate).init(params)

    verts_j = jnp.asarray(verts)
    tr_pos_j, tr_q_j = jnp.asarray(tr_pos), jnp.asarray(tr_q)
    te_pos_j, te_q_j = jnp.asarray(te_pos), jnp.asarray(te_q)

    history = []
    for epoch in range(cfg.epochs):
        k_train, k_e = jax.random.split(k_train)
        params, opt_state, loss = train_epoch(
            k_e, params, opt_state, verts_j, tr_pos_j, tr_q_j,
            cfg.batch_size, cfg.learning_rate)
        err = eval_mse(params, verts_j, te_pos_j, te_q_j)
        history.append((epoch, float(loss), float(err)))
        if verbose:
            print(f"epoch {epoch}: train_loss={float(loss):.4f} "
                  f"test_mse={float(err):.6f}")
    return params, history
