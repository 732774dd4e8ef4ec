"""k-nearest-volume queries + barycentric irradiance interpolation.

CPU-engine capabilities kept per SURVEY §2.4:

* bounded k-NN (k = CLOSEST_QUERY_COUNT, max dist) radiance-volume query —
  the reference walks a pointer KD-tree with a bounded priority queue
  (Old_CPU_Rendering_Engine/.../radiance_tree.cpp:111-177); here it is a
  dense masked top-k, the same matmul-shaped reduction as nn_search;
* barycentric interpolation of per-volume irradiance over the 3 nearest
  volumes, with averaging fallback (radiance_map.cpp:93-128,
  utils/interpolation.cpp:6-19);
* per-volume RGB irradiance for a query surface
  (radiance_volume.cpp:178-202): sum_s cos_s * q_s / (S * RHO) * diffuse_c
  of the *intersected* surface.

Deviations (documented): the grid is the GPU engine's scalar Q (the CPU
engine stores RGB); the reference's point-in-triangle test compares
u+v+w == 1.0 with EXACT float equality (interpolation.cpp:14) which almost
never holds, so its barycentric branch is nearly dead code — we use a 1e-4
tolerance, falling back to the same 3-volume average otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.config import RHO
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.radiance.volumes import RadianceVolumes


@partial(jax.jit, static_argnames=("k",))
def find_k_closest_volumes(vols: RadianceVolumes, qpos: jnp.ndarray,
                           qnorm: jnp.ndarray, k: int = 3,
                           max_dist: float = 0.5):
    """k nearest volumes with exact-normal filter and max-distance bound.

    qpos, qnorm: (N, 3).  Returns (idx (N, k) int32, valid (N, k) bool).
    """
    qv = qpos @ vols.position.T
    d2 = (jnp.sum(qpos * qpos, axis=-1)[:, None]
          + jnp.sum(vols.position * vols.position, axis=-1)[None, :]
          - 2.0 * qv)
    match = jnp.all(qnorm[:, None, :] == vols.normal[None, :, :], axis=-1)
    big = jnp.float32(1.0e12)
    score = jnp.where(match, d2, big)
    neg_top, idx = jax.lax.top_k(-score, k)
    valid = (-neg_top) <= max_dist * max_dist
    return idx.astype(jnp.int32), valid


def volume_irradiance_rgb(vols: RadianceVolumes, idx: jnp.ndarray,
                          surface_rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB irradiance of volumes `idx` (N,) for query surfaces with
    reflectance `surface_rgb` (N, 3) (ref: radiance_volume.cpp:178-202):

        sum_s cos_s * q_s / (S * RHO) * diffuse_c
    """
    cos = hs.sector_cos_thetas(vols.grid_resolution)           # (S,)
    s = vols.n_sectors
    acc = jnp.sum(vols.q[idx] * cos[None, :], axis=-1)         # (N,)
    return (acc / (s * RHO))[:, None] * surface_rgb


def barycentric_uvw(a, b, c, p):
    """The reference's area-ratio barycentric coordinates
    (ref: interpolation.cpp:6-19).  a,b,c,p: (N, 3) -> (u, v, w) each (N,)."""
    def _area(x, y):
        return jnp.linalg.norm(jnp.cross(x, y), axis=-1)

    area = jnp.maximum(_area(b - a, c - a), 1e-20)
    u = _area(a - c, p - c) / area
    v = _area(b - a, p - a) / area
    w = _area(c - b, p - b) / area
    return u, v, w


@jax.jit
def interpolated_irradiance(vols: RadianceVolumes, qpos: jnp.ndarray,
                            qnorm: jnp.ndarray, surface_rgb: jnp.ndarray,
                            max_dist: float = 0.5) -> jnp.ndarray:
    """Irradiance estimate at query points via 3-NN barycentric
    interpolation with averaging fallback (ref: radiance_map.cpp:93-128).

    qpos, qnorm, surface_rgb: (N, 3) -> (N, 3).
    """
    idx, valid = find_k_closest_volumes(vols, qpos, qnorm, k=3,
                                        max_dist=max_dist)
    irr = jnp.stack([volume_irradiance_rgb(vols, idx[:, i], surface_rgb)
                     for i in range(3)], axis=1)            # (N, 3, 3)
    n_valid = jnp.sum(valid.astype(jnp.float32), axis=-1)   # (N,)

    a = vols.position[idx[:, 0]]
    b = vols.position[idx[:, 1]]
    c = vols.position[idx[:, 2]]
    u, v, w = barycentric_uvw(a, b, c, qpos)
    in_tri = jnp.abs(u + v + w - 1.0) < 1e-4
    bary = (u[:, None] * irr[:, 0] + v[:, None] * irr[:, 1]
            + (1.0 - u - v)[:, None] * irr[:, 2])

    mask = valid.astype(jnp.float32)[:, :, None]
    avg = jnp.sum(irr * mask, axis=1) / jnp.maximum(n_valid, 1.0)[:, None]

    use_bary = (n_valid == 3) & in_tri
    out = jnp.where(use_bary[:, None], bary, avg)
    return jnp.where((n_valid > 0)[:, None], out, 0.0)
