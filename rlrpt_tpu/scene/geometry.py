"""Triangle geometry helpers (host-side numpy; scenes are built eagerly).

Equivalent of the reference's Triangle/Surface classes
(GPU_Rendering_Engine/Source/objects/{triangle,surface}.cu) re-expressed
over arrays: a scene is (N, 3) vertex arrays, not N objects.
"""

from __future__ import annotations

import numpy as np


def triangle_normals(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Face normals, matching the reference's orientation convention
    normalize(cross(e2, e1)) (ref: triangle.cu:67-76)."""
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e2, e1)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def triangle_areas(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Areas via 0.5*|AB||AC|sin(theta) (ref: triangle.cu:17-26)."""
    return 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)


def sample_points_on_triangles(rng: np.random.Generator, v0, v1, v2,
                               counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Uniformly sample `counts[i]` points on triangle i.

    The reference rejection-samples a1+a2<=1 (triangle.cu:30-64); we use the
    equivalent closed-form fold (a1, a2) -> (1-a1, 1-a2) when a1+a2>1, which
    yields the same uniform distribution without a data-dependent loop.

    Returns (points (sum(counts), 3), tri_index (sum(counts),)).
    """
    tri_idx = np.repeat(np.arange(len(counts)), counts)
    n = len(tri_idx)
    a = rng.random((n, 2), dtype=np.float64)
    fold = a.sum(axis=1) > 1.0
    a[fold] = 1.0 - a[fold]
    p = (v0[tri_idx]
         + a[:, :1] * (v1[tri_idx] - v0[tri_idx])
         + a[:, 1:2] * (v2[tri_idx] - v0[tri_idx]))
    return p.astype(np.float32), tri_idx


def luminance(rgb: np.ndarray) -> np.ndarray:
    """Scalar luminance = 0.5*(max+min channel) (ref: material.cu:4-14)."""
    return 0.5 * (rgb.max(axis=-1) + rgb.min(axis=-1))
