"""Closest-hit ray/triangle intersection.

The reference's hottest loop is a per-thread brute-force sweep over every
triangle solving a 3x3 system by Cramer's rule (ref: ray.cu:17-141; the
SURVEY marks Ray::closest_intersection as the hottest path).  The TPU-native
formulation is a dense (rays x triangles) Moller-Trumbore evaluation —
algebraically the same linear solve, arranged as fused elementwise ops on
(R_tile, T) blocks with an argmin reduction, tiled over rays so peak memory
stays O(ray_tile * n_triangles).

Notes vs the reference:
* the reference pre-scales the ray direction by SCREEN_HEIGHT before the
  solve (ray.cu:53), which only rescales the t parameter; we keep t in world
  units — identical hit points;
* the reference tests surfaces first, lights second, keeping strictly closer
  hits (ray.cu:17-36).  Our triangle array is [surfaces..., lights...] and
  argmin returns the first minimum, so tie-breaking is identical.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene

INF = jnp.float32(3.0e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """SoA intersection record (ref: ray.cuh:30-45 Intersection)."""

    t: jnp.ndarray          # (R,) distance along the (unit) ray, INF if miss
    tri: jnp.ndarray        # (R,) int32 triangle index into the scene arrays
    hit_type: jnp.ndarray   # (R,) int32: NOTHING / AREA_LIGHT / SURFACE
    position: jnp.ndarray   # (R, 3)
    normal: jnp.ndarray     # (R, 3)

    @property
    def local_index(self):
        """Index within the reference's split containers (surface index for
        SURFACE hits, light index for AREA_LIGHT hits)."""
        return self.tri  # callers subtract n_surfaces for lights if needed


def _hit_block(o: jnp.ndarray, d: jnp.ndarray, scene: Scene) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closest hit for a block of rays against all triangles.

    o, d: (R, 3).  Returns (t (R,), tri (R,) int32).
    """
    v0, e1, e2 = scene.v0, scene.v1 - scene.v0, scene.v2 - scene.v0  # (T, 3)

    # Moller-Trumbore, broadcast (R, 1, 3) x (1, T, 3) -> (R, T).
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])          # (R, T, 3)
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)            # (R, T)
    inv_det = jnp.where(det == 0.0, 0.0, 1.0 / det)
    tvec = o[:, None, :] - v0[None, :, :]                    # (R, T, 3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])                   # (R, T, 3)
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det

    valid = (det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    t = jnp.where(valid, t, INF)
    tri = jnp.argmin(t, axis=-1).astype(jnp.int32)           # first min wins
    tbest = jnp.take_along_axis(t, tri[:, None], axis=-1)[:, 0]
    return tbest, tri


@partial(jax.jit, static_argnames="ray_tile")
def closest_hit(o: jnp.ndarray, d: jnp.ndarray, scene: Scene,
                ray_tile: int = 8192) -> Hit:
    """Closest intersection for rays o + t*d (d unit), tiled over rays.

    o, d: (R, 3).  R is padded internally to a multiple of ray_tile.
    """
    r = o.shape[0]
    if r <= ray_tile:
        t, tri = _hit_block(o, d, scene)
    else:
        pad = (-r) % ray_tile
        o_p = jnp.pad(o, ((0, pad), (0, 0)))
        d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        o_c = o_p.reshape(-1, ray_tile, 3)
        d_c = d_p.reshape(-1, ray_tile, 3)
        t, tri = jax.lax.map(lambda od: _hit_block(od[0], od[1], scene),
                             (o_c, d_c))
        t = t.reshape(-1)[:r]
        tri = tri.reshape(-1)[:r]

    missed = t >= INF
    hit_type = jnp.where(
        missed, NOTHING,
        jnp.where(tri >= scene.n_surfaces, AREA_LIGHT, SURFACE)).astype(jnp.int32)
    t_safe = jnp.where(missed, 0.0, t)
    position = o + t_safe[:, None] * d
    normal = scene.normal[tri]
    return Hit(t=jnp.where(missed, INF, t), tri=tri, hit_type=hit_type,
               position=position, normal=normal)
