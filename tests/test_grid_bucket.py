"""Grid-bucketed NN search vs the exact dense argmin.

The bucket search is bounded-reach by design (like the reference's pruned
KD walk, radiance_map.cu:184-196); on realistic queries — hit points on the
scene's own surfaces, normals taken from those surfaces — it must agree
with the dense search essentially always, and any disagreement must still
return a normal-matched volume at a comparable distance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.config import RadianceVolumeConfig
from rlrpt_tpu.radiance.grid_bucket import (VolumeGrid, build_volume_grid,
                                            find_closest_volume_grid)
from rlrpt_tpu.radiance.nn_search import find_closest_volume
from rlrpt_tpu.radiance.volumes import build_radiance_volumes
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.scene.geometry import sample_points_on_triangles


def _surface_queries(scene, n_per_tri=4, seed=7):
    rng = np.random.default_rng(seed)
    ns = scene.n_surfaces
    counts = np.full(ns, n_per_tri, np.int64)
    pos, tri = sample_points_on_triangles(
        rng, np.asarray(scene.v0[:ns], np.float64),
        np.asarray(scene.v1[:ns], np.float64),
        np.asarray(scene.v2[:ns], np.float64), counts)
    return (jnp.asarray(pos, jnp.float32),
            jnp.asarray(np.asarray(scene.normal[:ns], np.float32)[tri]))


def test_grid_matches_dense_on_surface_points():
    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.01)
    vols = build_radiance_volumes(scene, rl)
    grid = build_volume_grid(vols)
    qpos, qnorm = _surface_queries(scene)

    dense = np.asarray(find_closest_volume(vols, qpos, qnorm))
    fast = np.asarray(find_closest_volume_grid(grid, qpos, qnorm))

    agree = np.mean(dense == fast)
    assert agree >= 0.99, f"agreement {agree}"

    # Disagreements must still be normal-matched and nearly as close.
    pos = np.asarray(vols.position)
    nrm = np.asarray(vols.normal)
    bad = np.flatnonzero(dense != fast)
    if bad.size:
        qd = np.linalg.norm(pos[dense[bad]] - np.asarray(qpos)[bad], axis=-1)
        qf = np.linalg.norm(pos[fast[bad]] - np.asarray(qpos)[bad], axis=-1)
        assert np.all(qf <= qd + 0.1)
        assert np.all(nrm[fast[bad]] == np.asarray(qnorm)[bad])


def test_grid_empty_neighbourhood_falls_back_to_volume_0():
    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.01)
    vols = build_radiance_volumes(scene, rl)
    grid = build_volume_grid(vols)
    # A query far outside the AABB clamps to a corner cell; if that cell has
    # candidates the result is a valid index, otherwise 0 — either way the
    # call must not produce an out-of-range index.
    q = jnp.asarray([[50.0, 50.0, 50.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    idx = np.asarray(find_closest_volume_grid(grid, q, n))
    assert 0 <= idx[0] < vols.n_volumes


def test_grid_payload_table_is_consistent():
    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.01)
    vols = build_radiance_volumes(scene, rl)
    grid = build_volume_grid(vols, k_max=16)
    pay = np.asarray(grid.payload)
    used = pay[..., 7] > 0.5
    idx = pay[..., 6][used].astype(np.int64)
    assert idx.min() >= 0 and idx.max() < vols.n_volumes
    # Stored positions/normals must be the volumes' own.
    np.testing.assert_allclose(pay[..., 0:3][used],
                               np.asarray(vols.position)[idx], rtol=0, atol=0)
    np.testing.assert_array_equal(pay[..., 3:6][used],
                                  np.asarray(vols.normal)[idx])
    # Every volume appears in its own cell's list (k_max large enough here
    # for the test density) or that cell is full of strictly closer ones.
    assert used.any()
