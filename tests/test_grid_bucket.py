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


def test_class_table_matches_grid_on_surface_points():
    """The precomputed answer table agrees with the bucket search on a
    large majority of surface queries; disagreements must still return a
    normal-matched volume at a comparable (cell-quantised) distance."""
    from rlrpt_tpu.radiance.grid_bucket import (build_volume_class_table,
                                                find_closest_volume_table)
    rng = np.random.default_rng(7)
    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.01)
    vols = build_radiance_volumes(scene, rl)
    grid = build_volume_grid(vols)
    tb = build_volume_class_table(vols, scene)

    ns = scene.n_surfaces
    tri = rng.integers(0, ns, 4000)
    u, v = rng.random(4000), rng.random(4000)
    fold = u + v > 1
    u[fold], v[fold] = 1 - u[fold], 1 - v[fold]
    v0 = np.asarray(scene.v0)[tri]
    e1 = np.asarray(scene.v1)[tri] - v0
    e2 = np.asarray(scene.v2)[tri] - v0
    p = (v0 + u[:, None] * e1 + v[:, None] * e2).astype(np.float32)
    nrm = np.asarray(scene.normal, np.float32)[tri]

    a_g = np.asarray(find_closest_volume_grid(grid, jnp.asarray(p),
                                              jnp.asarray(nrm)))
    a_t = np.asarray(find_closest_volume_table(tb, jnp.asarray(p),
                                               jnp.asarray(tri,
                                                           jnp.int32)))
    assert (a_g == a_t).mean() > 0.7
    vnrm = np.asarray(vols.normal)
    match_t = (vnrm[a_t] == nrm).all(axis=1).mean()
    match_g = (vnrm[a_g] == nrm).all(axis=1).mean()
    assert match_t > match_g - 0.02
    pos = np.asarray(vols.position)
    d_t = np.linalg.norm(pos[a_t] - p, axis=1)
    d_g = np.linalg.norm(pos[a_g] - p, axis=1)
    # table answers may be off by ~a cell's quantisation, never by more
    assert np.mean(d_t) < np.mean(d_g) + 1.5 / float(tb.inv_cell)


def test_class_table_sarsa_learning_matches_grid():
    """Whole-integrator gate: SARSA learning trajectories through the two
    search structures are statistically identical."""
    from rlrpt_tpu.camera import Camera
    from rlrpt_tpu.config import RenderConfig
    from rlrpt_tpu.integrators.sarsa_wavefront import (
        render_frame_sarsa_wavefront)
    from rlrpt_tpu.radiance.grid_bucket import build_volume_class_table

    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.02)
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=4,
                       max_ray_bounces=8)
    cam = Camera.create([0.0, 0.0, -3.0])
    vols0 = build_radiance_volumes(scene, rl)
    grid = build_volume_grid(vols0)
    tb = build_volume_class_table(vols0, scene)
    key = jax.random.PRNGKey(7)

    stats = {}
    for name, st in (("grid", grid), ("table", tb)):
        vols = vols0
        for f in range(2):
            img, vols, aux = render_frame_sarsa_wavefront(
                jax.random.fold_in(key, f), scene, cam, vols, st, cfg, rl,
                interpret=True)
        stats[name] = (float(aux["avg_path_length"]),
                       int(aux["zero_contribution_light_paths"]),
                       float(jnp.mean(img)))
    pg, zg, mg = stats["grid"]
    pt, zt, mt = stats["table"]
    assert abs(pt - pg) / pg < 0.05
    assert abs(zt - zg) / max(zg, 1) < 0.05
    # frame-mean MC noise at this budget is ~2-3%; 6% bounds the drift
    assert abs(mt - mg) / mg < 0.06


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


def test_class_table_memory_budget_coarsens_cell():
    from rlrpt_tpu.radiance.grid_bucket import (build_volume_class_table,
                                                find_closest_volume_table)
    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.02, max_volumes=512)
    vols = build_radiance_volumes(scene, rl)
    full = build_volume_class_table(vols, scene, mem_budget_bytes=None)
    budget = 1 << 20                                 # 1 MB: forces coarsening
    capped = build_volume_class_table(vols, scene, mem_budget_bytes=budget)
    assert capped.nbytes <= budget + capped.tri_class.size * 4
    assert capped.table.shape[0] < full.table.shape[0]
    # Queries still resolve to valid volume ids and mostly agree with the
    # uncapped table (coarser quantisation, same bounded-reach semantics).
    qpos, _ = _surface_queries(scene)
    tri = jnp.zeros((qpos.shape[0],), jnp.int32)
    tri = jnp.asarray(np.repeat(np.arange(scene.n_surfaces), 4), jnp.int32)
    a = np.asarray(find_closest_volume_table(full, qpos, tri))
    b = np.asarray(find_closest_volume_table(capped, qpos, tri))
    assert np.all((b >= 0) & (b < int(vols.n_volumes)))
    assert np.mean(a == b) > 0.5, np.mean(a == b)
