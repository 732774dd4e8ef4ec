"""Small vector-math helpers (the glm-equivalent layer).

Everything is written over batched (..., 3) arrays so the same function
serves one ray or a whole wavefront; XLA fuses these into surrounding
kernels, there is no materialised "vec3 object" anywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def make_frame(normal: jnp.ndarray) -> jnp.ndarray:
    """Build the hemisphere local->world rotation for a surface normal.

    Matches the reference basis construction exactly
    (ref: hemisphere_helpers.cu:31-44 create_normal_coordinate_system and
    :48-63 create_transformation_matrix): rows are (T, N, B) so that a local
    hemisphere point p = (x, y, z) with y "up" maps to world as
    ``x*T + y*N + z*B`` = ``p @ frame``.

    normal: (..., 3) unit normals.  Returns (..., 3, 3).
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(ny)
    # |n.x| > |n.y|: T = normalize((n.z, 0, -n.x)); else T = normalize((0, -n.z, n.y))
    t = jnp.where(
        use_x[..., None],
        jnp.stack([nz, jnp.zeros_like(nx), -nx], axis=-1),
        jnp.stack([jnp.zeros_like(nx), -nz, ny], axis=-1),
    )
    t = normalize(t, eps=1e-20)
    b = jnp.cross(normal, t)
    return jnp.stack([t, normal, b], axis=-2)


def frame_to_world(frame: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    """Rotate local hemisphere coordinates into world space.

    frame: (..., 3, 3) rows (T, N, B);  local: (..., 3).
    """
    return jnp.einsum("...i,...ij->...j", local, frame)
