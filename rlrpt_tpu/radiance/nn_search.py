"""Nearest radiance-volume queries.

The reference walks a flattened KD-tree with an explicit 30-deep stack on
the GPU (ref: radiance_map.cu:150-203, radiance_tree.cu, stack.cuh) — a
data-dependent tree walk that is hostile to TPUs.  With 10^3-10^5 volumes
the TPU-native choice is a dense, matmul-shaped masked argmin:

    d2(q, v) = |q|^2 + |v|^2 - 2 q.v        (the q.v term rides the MXU)

filtered by the reference's exact-normal-match rule (radiance_map.cu:175).
Tiled over queries so peak memory is O(tile * V).

Fallback semantics: the reference's search initialises "closest" to volume 0
and returns it when no exact-normal match is found on the pruned path
(radiance_map.cu:163-166) — it never returns NULL in practice.  We return
the distance-argmin among *all* volumes in that case (strictly more
sensible, statistically equivalent; documented deviation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.radiance.volumes import RadianceVolumes


def _find_block(qpos: jnp.ndarray, qnorm: jnp.ndarray,
                vpos: jnp.ndarray, vnorm: jnp.ndarray) -> jnp.ndarray:
    """qpos, qnorm: (N, 3); vpos, vnorm: (V, 3) -> (N,) int32 indices."""
    # Squared distances via the MXU-friendly expansion.
    qv = qpos @ vpos.T                                   # (N, V) matmul
    d2 = (jnp.sum(qpos * qpos, axis=-1)[:, None]
          + jnp.sum(vpos * vpos, axis=-1)[None, :] - 2.0 * qv)
    # Exact normal equality (ref: radiance_map.cu:175 `normal == rte.normal`).
    match = jnp.all(qnorm[:, None, :] == vnorm[None, :, :], axis=-1)
    # Penalise (not exclude) mismatches: if nothing matches we still return
    # the overall nearest volume (see module docstring).
    big = jnp.float32(1.0e12)
    score = d2 + jnp.where(match, 0.0, big)
    return jnp.argmin(score, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames="query_tile")
def find_closest_volume(vols: RadianceVolumes, qpos: jnp.ndarray,
                        qnorm: jnp.ndarray, query_tile: int = 2048) -> jnp.ndarray:
    """Nearest volume (normal-filtered) for each query point.

    qpos, qnorm: (N, 3).  Returns (N,) int32 volume indices.
    """
    n = qpos.shape[0]
    if n <= query_tile:
        return _find_block(qpos, qnorm, vols.position, vols.normal)
    pad = (-n) % query_tile
    qp = jnp.pad(qpos, ((0, pad), (0, 0)))
    qn = jnp.pad(qnorm, ((0, pad), (0, 0)))
    out = jax.lax.map(
        lambda args: _find_block(args[0], args[1], vols.position, vols.normal),
        (qp.reshape(-1, query_tile, 3), qn.reshape(-1, query_tile, 3)))
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("k", "query_tile"))
def find_k_closest_volumes(vols: RadianceVolumes, qpos: jnp.ndarray,
                           qnorm: jnp.ndarray, k: int = 3,
                           query_tile: int = 2048):
    """k nearest volumes (normal-filtered) — the CPU engine's bounded
    priority-queue k-NN (ref: Old_CPU_Rendering_Engine/.../radiance_tree.cpp:
    111-177), used for barycentric irradiance interpolation.

    Returns (idx (N, k) int32, valid (N, k) bool) where valid marks
    exact-normal matches.
    """
    n = qpos.shape[0]

    def block(qp, qn):
        qv = qp @ vols.position.T
        d2 = (jnp.sum(qp * qp, axis=-1)[:, None]
              + jnp.sum(vols.position * vols.position, axis=-1)[None, :]
              - 2.0 * qv)
        match = jnp.all(qn[:, None, :] == vols.normal[None, :, :], axis=-1)
        big = jnp.float32(1.0e12)
        score = d2 + jnp.where(match, 0.0, big)
        neg_top, idx = jax.lax.top_k(-score, k)
        return idx.astype(jnp.int32), (-neg_top) < big

    if n <= query_tile:
        return block(qpos, qnorm)
    pad = (-n) % query_tile
    qp = jnp.pad(qpos, ((0, pad), (0, 0)))
    qn = jnp.pad(qnorm, ((0, pad), (0, 0)))
    idx, valid = jax.lax.map(
        lambda args: block(args[0], args[1]),
        (qp.reshape(-1, query_tile, 3), qn.reshape(-1, query_tile, 3)))
    return idx.reshape(-1, k)[:n], valid.reshape(-1, k)[:n]
