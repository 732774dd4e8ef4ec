"""Radiance-volume visualisation meshes (RENDER_SAVED_RADIANCE_VOLUMES).

Builds the hemisphere sector meshes the reference injects into the scene to
inspect learned distributions (ref: radiance_volume.cu:441-515 get_vertices
/ build_surfaces, toggled by RENDER_SAVED_RADIANCE_VOLUMES and consumed by
scene.cu:41-46): per sector two triangles on the DIAMETER-scaled hemisphere
shell, coloured (ratio, 1-ratio, 0) by the sector's share of the volume's
max distribution value, normals pointing outward from the volume centre.
"""

from __future__ import annotations

import numpy as np

from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.radiance.map_io import cdf_to_distribution
from rlrpt_tpu.radiance.volumes import RadianceVolumes
from rlrpt_tpu.scene.scene import Scene, build_scene


def volume_mesh(position: np.ndarray, frame: np.ndarray, dist: np.ndarray,
                grid_resolution: int, diameter: float = 0.15):
    """Sector mesh for one volume.

    position (3,), frame (3,3), dist (S,) the plain (non-cumulative)
    distribution.  Returns (v0, v1, v2, rgb) each (2*S, ...).
    """
    g = grid_resolution
    gx, gy = np.meshgrid(np.arange(g + 1, dtype=np.float32),
                         np.arange(g + 1, dtype=np.float32), indexing="ij")
    local = np.asarray(hs.grid_pos_to_local(gx, gy, g)) * diameter
    world = local @ np.asarray(frame) + np.asarray(position)   # (g+1,g+1,3)

    v0 = world[:-1, :-1].reshape(-1, 3)
    v1 = world[1:, :-1].reshape(-1, 3)
    v2 = world[:-1, 1:].reshape(-1, 3)
    v3 = world[1:, 1:].reshape(-1, 3)

    max_q = max(float(np.max(dist)), 1e-12)
    ratio = (np.asarray(dist).reshape(-1) / max_q).astype(np.float32)
    rgb = np.stack([ratio, 1.0 - ratio, np.zeros_like(ratio)], axis=-1)

    # Two triangles per sector: (v0, v2, v1) and (v1, v2, v3)
    # (ref: radiance_volume.cu:488-489).
    tv0 = np.concatenate([v0, v1])
    tv1 = np.concatenate([v2, v2])
    tv2 = np.concatenate([v1, v3])
    trgb = np.concatenate([rgb, rgb])
    return tv0, tv1, tv2, trgb


def volumes_to_surfaces(vols: RadianceVolumes, indices=None,
                        diameter: float = 0.15):
    """Meshes for `indices` (default: all volumes).

    Returns (v0, v1, v2, rgb) stacked over volumes."""
    if indices is None:
        indices = range(vols.n_volumes)
    dist = cdf_to_distribution(np.asarray(vols.cdf))
    pos = np.asarray(vols.position)
    frame = np.asarray(vols.frame)
    parts = [volume_mesh(pos[i], frame[i], dist[i], vols.grid_resolution,
                         diameter) for i in indices]
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(4))


def inject_volumes_into_scene(scene: Scene, vols: RadianceVolumes,
                              indices=None, diameter: float = 0.15) -> Scene:
    """New Scene with the volume meshes appended as surfaces
    (the reference's scene.cu:41-46 injection path)."""
    v0, v1, v2, rgb = volumes_to_surfaces(vols, indices, diameter)
    ns = scene.n_surfaces
    return build_scene(
        np.concatenate([np.asarray(scene.v0)[:ns], v0]),
        np.concatenate([np.asarray(scene.v1)[:ns], v1]),
        np.concatenate([np.asarray(scene.v2)[:ns], v2]),
        np.concatenate([np.asarray(scene.diffuse_c)[:ns], rgb]),
        np.asarray(scene.v0)[ns:], np.asarray(scene.v1)[ns:],
        np.asarray(scene.v2)[ns:], np.asarray(scene.emission)[ns:])
