"""Pinhole camera with yaw-pair rotation.

Mirrors the reference Camera (GPU_Rendering_Engine/Source/camera.cu) —
a position plus yaw_y / yaw_x angles; rotations deliberately rotate the
*position* about the origin as well (camera.cu:9-45), and primary-ray
generation matches Ray::sample_ray_through_pixel + rotate_ray
(ray.cu:145-172): dir = (x - W/2, y - H/2, focal) rotated by R_y(yaw_y)
then R_x(yaw_x).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    position: jnp.ndarray  # (3,)
    yaw_y: jnp.ndarray     # scalar
    yaw_x: jnp.ndarray     # scalar

    @staticmethod
    def create(position, yaw_y: float = 0.0, yaw_x: float = 0.0) -> "Camera":
        return Camera(position=jnp.asarray(position, jnp.float32),
                      yaw_y=jnp.asarray(yaw_y, jnp.float32),
                      yaw_x=jnp.asarray(yaw_x, jnp.float32))

    # --- rotation controls (ref: camera.cu:9-45). The reference applies an
    # incremental rotation to the position each call and accumulates yaw.
    def rotate_left(self, y: float) -> "Camera":
        return self._rot_y(+y)

    def rotate_right(self, y: float) -> "Camera":
        return self._rot_y(-y)

    def rotate_up(self, x: float) -> "Camera":
        return self._rot_x(-x)

    def rotate_down(self, x: float) -> "Camera":
        return self._rot_x(+x)

    def _rot_y(self, y: float) -> "Camera":
        c, s = math.cos(y), math.sin(y)
        # glm columns (camera.cu:11-14): world-space row-major matrix
        # [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        m = jnp.asarray([[c, 0, -s], [0, 1, 0], [s, 0, c]], jnp.float32)
        return Camera(position=m @ self.position, yaw_y=self.yaw_y + y,
                      yaw_x=self.yaw_x)

    def _rot_x(self, x: float) -> "Camera":
        c, s = math.cos(x), math.sin(x)
        # glm columns (camera.cu:29-33): row-major [[1,0,0],[0,c,s],[0,-s,c]]
        m = jnp.asarray([[1, 0, 0], [0, c, s], [0, -s, c]], jnp.float32)
        return Camera(position=m @ self.position, yaw_y=self.yaw_y,
                      yaw_x=self.yaw_x + x)

    # --- movement (ref: camera.cu:47-83).  The reference computes the new
    # position along the current yaw, then runs it through look_at(new, up)
    # whose translation column IS the new position — so position simply
    # moves; yaw is unchanged.
    def move_forwards(self, distance: float) -> "Camera":
        delta = jnp.stack([-distance * jnp.sin(self.yaw_y),
                           jnp.zeros_like(self.yaw_y),
                           distance * jnp.cos(self.yaw_y)])
        return Camera(position=self.position + delta, yaw_y=self.yaw_y,
                      yaw_x=self.yaw_x)

    def move_backwards(self, distance: float) -> "Camera":
        return self.move_forwards(-distance)


def rotate_dirs(d: jnp.ndarray, yaw_y, yaw_x) -> jnp.ndarray:
    """Apply Ray::rotate_ray (ref: ray.cu:163-172) to directions (..., 3)."""
    cy, sy = jnp.cos(yaw_y), jnp.sin(yaw_y)
    cx, sx = jnp.cos(yaw_x), jnp.sin(yaw_x)
    # R_y columns (cy,0,sy),(0,1,0),(-sy,0,cy) => row-major [[cy,0,-sy],[0,1,0],[sy,0,cy]]
    x1 = cy * d[..., 0] - sy * d[..., 2]
    y1 = d[..., 1]
    z1 = sy * d[..., 0] + cy * d[..., 2]
    # R_x columns (1,0,0),(0,cx,-sx),(0,sx,cx) => row-major [[1,0,0],[0,cx,sx],[0,-sx,cx]]
    x2 = x1
    y2 = cx * y1 + sx * z1
    z2 = -sx * y1 + cx * z1
    return jnp.stack([x2, y2, z2], axis=-1)


def primary_rays(key, camera: Camera, width: int, height: int, focal: float):
    """Jittered primary rays for every pixel.

    Returns (origins (H*W, 3), dirs (H*W, 3)) laid out row-major by
    (y, x) — image[y, x] corresponds to ray index y*width + x.
    ref: ray.cu:145-159.
    """
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    u = jax.random.uniform(key, (height, width, 2), dtype=jnp.float32)
    px = xs + u[..., 0]
    py = ys + u[..., 1]
    d = jnp.stack([px - width / 2.0, py - height / 2.0,
                   jnp.full_like(px, focal)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = rotate_dirs(d, camera.yaw_y, camera.yaw_x)
    o = jnp.broadcast_to(camera.position, d.shape)
    return o.reshape(-1, 3), d.reshape(-1, 3)
