"""SoA scene container.

Equivalent of the reference `Scene{Surface*, AreaLight*, float* vertices}`
(GPU_Rendering_Engine/Source/scenes/scene.cuh:27-47) re-designed as a JAX
pytree of dense arrays: surfaces and area lights live in ONE triangle array
(surfaces first, then lights) so the closest-hit sweep is a single masked
argmin; the reference's "test surfaces, then lights, keep strictly closer"
scan (ray.cu:17-36) has identical tie-breaking because argmin returns the
first minimum and surfaces precede lights.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.scene.geometry import luminance, triangle_areas, triangle_normals

# Intersection types (ref: ray.cuh:30-45 enum NOTHING/AREA_LIGHT/SURFACE).
NOTHING = 0
AREA_LIGHT = 1
SURFACE = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """All triangles of a scene, surfaces `[0, n_surfaces)` then lights."""

    v0: jnp.ndarray        # (T, 3)
    v1: jnp.ndarray        # (T, 3)
    v2: jnp.ndarray        # (T, 3)
    normal: jnp.ndarray    # (T, 3)  normalize(cross(e2, e1))
    diffuse_c: jnp.ndarray  # (T, 3) material reflectance; zeros for lights
    emission: jnp.ndarray   # (T, 3) light diffuse_p; zeros for surfaces
    luminance: jnp.ndarray  # (T,)   0.5*(max+min) of diffuse_c / diffuse_p
    n_surfaces: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_triangles(self) -> int:
        return self.v0.shape[0]

    def to_device(self) -> "Scene":
        """Copy with jnp leaves.

        Scenes are built with HOST numpy leaves (host consumers read them
        without tunnelled D2H round-trips; jit calls transfer the few KB
        per dispatch).  Functions that CLOSE OVER a scene inside jit must
        convert first: a numpy leaf indexed by a tracer
        (scene.normal[tri]) raises TracerArrayConversionError, a jnp leaf
        becomes a program constant and works."""
        return dataclasses.replace(
            self, v0=jnp.asarray(self.v0), v1=jnp.asarray(self.v1),
            v2=jnp.asarray(self.v2), normal=jnp.asarray(self.normal),
            diffuse_c=jnp.asarray(self.diffuse_c),
            emission=jnp.asarray(self.emission),
            luminance=jnp.asarray(self.luminance))

    @property
    def n_lights(self) -> int:
        return self.n_triangles - self.n_surfaces

    @property
    def is_light(self) -> jnp.ndarray:
        return jnp.arange(self.n_triangles) >= self.n_surfaces

    # --- views matching the reference's split containers -----------------
    def surface_slice(self, arr):
        return arr[: self.n_surfaces]

    def light_slice(self, arr):
        return arr[self.n_surfaces:]

    @property
    def vertices_flat(self) -> jnp.ndarray:
        """Flat (T*9,) vertex list in the reference's order (v0 v1 v2 per
        triangle, surfaces then lights) — the DQN input encoding and the
        vertices.txt contract (ref: scene.cu:63-88)."""
        return jnp.concatenate(
            [self.v0, self.v1, self.v2], axis=-1).reshape(-1)

    @property
    def vertices_count(self) -> int:
        """Number of floats in the flat vertex list (the reference's
        scene.vertices_count, used as the DQN input dim)."""
        return self.n_triangles * 9


def build_scene(
    surf_v0: np.ndarray, surf_v1: np.ndarray, surf_v2: np.ndarray,
    surf_rgb: np.ndarray,
    light_v0: np.ndarray, light_v1: np.ndarray, light_v2: np.ndarray,
    light_power: np.ndarray,
    dtype=jnp.float32,
) -> Scene:
    """Assemble a Scene from host numpy surface + light triangle soup."""
    surf_v0 = np.asarray(surf_v0, np.float32).reshape(-1, 3)
    surf_v1 = np.asarray(surf_v1, np.float32).reshape(-1, 3)
    surf_v2 = np.asarray(surf_v2, np.float32).reshape(-1, 3)
    light_v0 = np.asarray(light_v0, np.float32).reshape(-1, 3)
    light_v1 = np.asarray(light_v1, np.float32).reshape(-1, 3)
    light_v2 = np.asarray(light_v2, np.float32).reshape(-1, 3)
    surf_rgb = np.asarray(surf_rgb, np.float32).reshape(-1, 3)
    light_power = np.asarray(light_power, np.float32).reshape(-1, 3)

    ns, nl = len(surf_v0), len(light_v0)
    v0 = np.concatenate([surf_v0, light_v0], axis=0)
    v1 = np.concatenate([surf_v1, light_v1], axis=0)
    v2 = np.concatenate([surf_v2, light_v2], axis=0)
    normal = triangle_normals(v0, v1, v2)
    diffuse_c = np.concatenate([surf_rgb, np.zeros((nl, 3), np.float32)], axis=0)
    emission = np.concatenate([np.zeros((ns, 3), np.float32), light_power], axis=0)
    lum = np.concatenate([luminance(surf_rgb), luminance(light_power)], axis=0)

    # HOST numpy leaves, deliberately: jit calls transfer the ~tens of KB
    # per dispatch (negligible), while host-side consumers (volume
    # builders, the class-table/KD builds, exporters) read instantly —
    # device-resident scene arrays cost a D2H round-trip PER FIELD over
    # the tunnelled TPU (measured ~13 s each at process start, ~110 s per
    # harness run just to compute triangle areas).
    as_h = lambda a: np.asarray(a, np.dtype(dtype))
    return Scene(v0=as_h(v0), v1=as_h(v1), v2=as_h(v2), normal=as_h(normal),
                 diffuse_c=as_h(diffuse_c), emission=as_h(emission),
                 luminance=as_h(lum), n_surfaces=ns)


def surface_areas(scene: Scene) -> np.ndarray:
    """Areas of the surface triangles only (host numpy).

    Transfer first, slice second: slicing a device array eagerly compiles a
    tiny XLA program per op, which on a tunnelled TPU costs seconds each.
    """
    v0 = np.asarray(scene.v0)[: scene.n_surfaces]
    v1 = np.asarray(scene.v1)[: scene.n_surfaces]
    v2 = np.asarray(scene.v2)[: scene.n_surfaces]
    return triangle_areas(v0, v1, v2)


def save_vertices_to_file(scene: Scene, path: str) -> None:
    """Write the renderer<->offline-trainer vertex contract
    (ref: scene.cu:63-88 save_vertices_to_file -> vertices.txt)."""
    v0 = np.asarray(scene.v0)
    v1 = np.asarray(scene.v1)
    v2 = np.asarray(scene.v2)
    with open(path, "w") as f:
        for i in range(scene.n_triangles):
            row = np.concatenate([v0[i], v1[i], v2[i]])
            f.write(" ".join(_fmt(x) for x in row) + "\n")


def load_vertices_from_file(path: str) -> np.ndarray:
    """Read vertices.txt -> flat float32 array (ref: NN_Q_Value_Trainer/
    Source/main.cu:39-70 load_vertices)."""
    vals: list[float] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                vals.extend(float(t) for t in line.split())
    return np.asarray(vals, np.float32)


def _fmt(x: float) -> str:
    # Match C++ default ostream float formatting (6 significant digits).
    return f"{float(x):.6g}"


def morton_sort_surfaces(scene: Scene) -> Scene:
    """Reorder SURFACE triangles along a Morton (Z-order) curve of their
    centroids; lights keep their trailing positions.

    The megakernel sweeps triangles in fixed chunks; its AABB pre-reject
    (ops.megakernel chunk culling) only fires when a chunk's triangles
    are spatially TIGHT.  OBJ files interleave spatially distant faces,
    inflating every chunk's bounding box — a Morton sort makes chunks
    compact without any runtime structure (the estimator is unchanged;
    only exact closest-hit TIE-BREAK order differs, which the reference's
    first-tested-wins sweep leaves arbitrary anyway, ray.cu:17-36).
    """
    ns = scene.n_surfaces
    cen = (np.asarray(scene.v0[:ns], np.float64)
           + np.asarray(scene.v1[:ns], np.float64)
           + np.asarray(scene.v2[:ns], np.float64)) / 3.0
    lo = cen.min(axis=0)
    ext = np.maximum(cen.max(axis=0) - lo, 1e-12)
    qi = np.clip(((cen - lo) / ext * 1023.0).astype(np.uint64), 0, 1023)

    def _spread(x):
        x = (x | (x << 16)) & np.uint64(0x0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x0C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x249249249249)
        return x

    code = (_spread(qi[:, 0]) | (_spread(qi[:, 1]) << np.uint64(1))
            | (_spread(qi[:, 2]) << np.uint64(2)))
    order = np.argsort(code, kind="stable")
    perm = np.concatenate(
        [order, np.arange(ns, scene.v0.shape[0])]).astype(np.int64)

    def take(a):
        arr = np.asarray(a)[perm]
        return jnp.asarray(arr) if isinstance(a, jnp.ndarray) else arr

    return Scene(v0=take(scene.v0), v1=take(scene.v1), v2=take(scene.v2),
                 normal=take(scene.normal), diffuse_c=take(scene.diffuse_c),
                 emission=take(scene.emission),
                 luminance=take(scene.luminance), n_surfaces=ns)
