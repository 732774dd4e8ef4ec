"""Hemisphere sampling math.

Implements, fully vectorised and branch-free (jnp.where over octants):

* Chiu's concentric square->hemisphere map — the action-index <-> direction
  bijection shared by BOTH RL methods (ref: hemisphere_helpers.cu:134-226);
* grid-sector -> direction conversion, centre and jittered variants
  (ref: hemisphere_helpers.cu:96-121);
* uniform hemisphere sampling (ref: hemisphere_helpers.cu:8-25, :67-93).

A key TPU simplification proved from the reference's own math: the cosine
between a sector direction and the surface normal equals the *local* y
coordinate of the mapped hemisphere point (the frame is a rigid rotation
taking local-y to the normal), so the per-sector cos(theta) table used by
the SARSA CDF rebuild (radiance_volume.cu:149-188) and the Q*cos weighting
of the deep tracer (nn_rendering_helpers.cu:415-436) is one constant
(n_sectors,) vector, not a per-volume computation.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.ops.linalg import frame_to_world

PI = math.pi


def concentric_map(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Map points of the unit square to the unit hemisphere (y up).

    Branch-free rewrite of the 8-octant Chiu map
    (ref: hemisphere_helpers.cu:134-226).  x, y: (...,) in [0, 1].
    Returns (..., 3) unit vectors with component y >= 0.
    """
    a = 2.0 * x - 1.0
    b = 2.0 * y - 1.0

    abv = b > -a  # above y = -x
    blw = b < a   # below y = x
    pos_b = b > 0.0
    pos_a = a > 0.0

    # xx / yy / offset per octant (1-8), as in the reference's nesting.
    xx = jnp.where(
        abv,
        jnp.where(blw, a, b),
        jnp.where(b > a, -a, -b),
    )
    yy = jnp.where(
        abv,
        jnp.where(
            blw,
            jnp.where(pos_b, b, a + b),          # octant 1 / 8
            jnp.where(pos_a, b - a, -a),         # octant 2 / 3
        ),
        jnp.where(
            b > a,
            jnp.where(pos_b, -a - b, -b),        # octant 4 / 5
            jnp.where(pos_a, a, a - b),          # octant 7 / 6
        ),
    )
    offset = jnp.where(
        abv,
        jnp.where(
            blw,
            jnp.where(pos_b, 0.0, 7.0 * PI / 4.0),
            jnp.where(pos_a, PI / 4.0, PI / 2.0),
        ),
        jnp.where(
            b > a,
            jnp.where(pos_b, 3.0 * PI / 4.0, PI),
            jnp.where(pos_a, 3.0 * PI / 2.0, 5.0 * PI / 4.0),
        ),
    )

    safe_xx = jnp.where(xx == 0.0, 1.0, xx)
    cos_t = 1.0 - xx * xx
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = offset + (PI / 4.0) * (yy / safe_xx)

    out = jnp.stack([sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], axis=-1)
    # Origin (and any degenerate xx == 0 point) -> straight up, as in the ref.
    origin = xx == 0.0
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], out.dtype), out.shape)
    return jnp.where(origin[..., None], up, out)


def grid_pos_to_local(gx: jnp.ndarray, gy: jnp.ndarray, grid_resolution: int) -> jnp.ndarray:
    """Continuous grid coordinates -> local hemisphere point.

    ref: hemisphere_helpers.cu:96-105 (divides by GRID_RESOLUTION then maps).
    """
    g = float(grid_resolution)
    return concentric_map(gx / g, gy / g)


def grid_pos_to_direction(gx, gy, frame, grid_resolution: int) -> jnp.ndarray:
    """Grid coordinates -> world-space unit direction for a hemisphere frame.

    Because the frame is a rotation and the local point is unit length, the
    reference's normalize(world_point - position) equals rotating the local
    point (ref: hemisphere_helpers.cu:96-105).
    """
    return frame_to_world(frame, grid_pos_to_local(gx, gy, grid_resolution))


def sector_centre_dirs_local(grid_resolution: int) -> jnp.ndarray:
    """Local directions of all sector centres, ordered idx = sx*G + sy.

    ref: radiance_volume.cu:61 (convert_grid_pos_to_direction(x+0.5, y+0.5)).
    Returns (n_sectors, 3).
    """
    g = grid_resolution
    sx = jnp.repeat(jnp.arange(g, dtype=jnp.float32), g)
    sy = jnp.tile(jnp.arange(g, dtype=jnp.float32), g)
    return grid_pos_to_local(sx + 0.5, sy + 0.5, g)


def sector_cos_thetas(grid_resolution: int) -> jnp.ndarray:
    """cos(theta) between each sector-centre direction and the normal.

    Equals the local y component (see module docstring).  (n_sectors,).
    """
    return sector_centre_dirs_local(grid_resolution)[:, 1]


def sector_index_to_grid(idx: jnp.ndarray, grid_resolution: int):
    """Sector index -> (sx, sy) (ref: nn_rendering_helpers.cu:18-19)."""
    sx = idx // grid_resolution
    sy = idx - sx * grid_resolution
    return sx, sy


def sample_sector_direction(key, sector_idx: jnp.ndarray, frame: jnp.ndarray,
                            grid_resolution: int) -> jnp.ndarray:
    """Jittered direction within a sector, world space.

    ref: hemisphere_helpers.cu:108-121 convert_grid_pos_to_direction_random.
    sector_idx: (...,) int; frame: (..., 3, 3).
    """
    sx, sy = sector_index_to_grid(sector_idx, grid_resolution)
    r = jax.random.uniform(key, sector_idx.shape + (2,), dtype=jnp.float32)
    return grid_pos_to_direction(sx.astype(jnp.float32) + r[..., 0],
                                 sy.astype(jnp.float32) + r[..., 1],
                                 frame, grid_resolution)


def uniform_hemisphere_local(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Uniform unit-hemisphere sample in local coords, y = cos(theta) = r1.

    ref: hemisphere_helpers.cu:8-25.
    """
    sin_t = jnp.sqrt(jnp.maximum(1.0 - r1 * r1, 0.0))
    phi = 2.0 * PI * r2
    return jnp.stack([sin_t * jnp.cos(phi), r1, sin_t * jnp.sin(phi)], axis=-1)


def sample_uniform_direction(key, normal: jnp.ndarray):
    """Uniformly sample directions about normals; returns (dir, cos_theta).

    Matches sample_random_direction_around_intersection
    (ref: hemisphere_helpers.cu:67-93): local x maps to B, y to N, z to T.
    normal: (..., 3).
    """
    from rlrpt_tpu.ops.linalg import make_frame

    r = jax.random.uniform(key, normal.shape[:-1] + (2,), dtype=jnp.float32)
    cos_theta = r[..., 0]
    local = uniform_hemisphere_local(cos_theta, r[..., 1])
    frame = make_frame(normal)  # rows (T, N, B)
    t, n, b = frame[..., 0, :], frame[..., 1, :], frame[..., 2, :]
    d = (local[..., 0:1] * b + local[..., 1:2] * n + local[..., 2:3] * t)
    return d, cos_theta


@partial(jax.jit, static_argnames="grid_resolution")
def dirs_to_sector_cos(frame: jnp.ndarray, grid_resolution: int) -> jnp.ndarray:
    """All sector-centre directions in world space for frames (..., 3, 3).

    Returns (..., n_sectors, 3)."""
    local = sector_centre_dirs_local(grid_resolution)  # (S, 3)
    return jnp.einsum("si,...ij->...sj", local, frame)
