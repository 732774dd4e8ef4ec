"""Voronoi debug renderer — primary rays coloured by nearest radiance volume.

Visual check of volume density / NN-search correctness
(ref: GPU_Rendering_Engine/Source/path_tracing/voronoi_trace.cu:16-38 and
radiance_map.cu:205-225; colours from radiance_volume.cu:309-328, which
stashes a random RGB in grid[0..2] — here colours are their own array).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.radiance.nn_search import find_closest_volume
from rlrpt_tpu.radiance.volumes import RadianceVolumes
from rlrpt_tpu.scene.scene import SURFACE, Scene


def voronoi_colours(key, n_volumes: int) -> jnp.ndarray:
    """Random RGB per volume (ref: radiance_volume.cu:311-318)."""
    return jax.random.uniform(key, (n_volumes, 3), dtype=jnp.float32)


@partial(jax.jit, static_argnames="cfg")
def render_voronoi(key, scene: Scene, camera: Camera, vols: RadianceVolumes,
                   colours: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """One primary-ray pass; surface hits take the nearest volume's colour,
    everything else is white (ref: voronoi_trace.cu:30-38)."""
    o, d = primary_rays(key, camera, cfg.width, cfg.height, cfg.focal)
    hit = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
    idx = find_closest_volume(vols, hit.position, hit.normal)
    col = jnp.where((hit.hit_type == SURFACE)[:, None], colours[idx], 1.0)
    return col.reshape(cfg.height, cfg.width, 3)
