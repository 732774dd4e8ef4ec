"""State encodings for the deep-Q tracer.

The reference encodes a 3-D point as the scene's flat vertex list translated
into a coordinate system centred at the point
(ref: nn_rendering_helpers.cu:281-298 convert_vertices_to_point_coord_system;
offline variant NN_Q_Value_Trainer/Source/main.cu:25-36).
"""

from __future__ import annotations

import jax.numpy as jnp


def relative_vertex_encoding(scene_vertices_flat: jnp.ndarray,
                             positions: jnp.ndarray) -> jnp.ndarray:
    """scene_vertices_flat: (F,) with F = 9 * n_triangles;
    positions: (R, 3).  Returns (R, F) — every vertex minus the position."""
    f = scene_vertices_flat.shape[0]
    verts = scene_vertices_flat.reshape(1, f // 3, 3)
    rel = verts - positions[:, None, :]
    return rel.reshape(positions.shape[0], f)
