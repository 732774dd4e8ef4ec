"""Scene construction tests: Cornell builder, OBJ importer, presets."""

import numpy as np
import jax.numpy as jnp
import pytest

from rlrpt_tpu.scene import cornell_box, load_obj_scene, presets
from rlrpt_tpu.scene.geometry import (luminance, sample_points_on_triangles,
                                      triangle_areas, triangle_normals)
from rlrpt_tpu.scene.scene import save_vertices_to_file, load_vertices_from_file


def test_cornell_counts_and_bounds():
    s = cornell_box()
    # 16 room tris + 2x10 block tris = 36 surfaces, 2 lights
    # (ref: cornell_box_scene.cu)
    assert s.n_surfaces == 36
    assert s.n_lights == 2
    v = np.concatenate([np.asarray(s.v0), np.asarray(s.v1), np.asarray(s.v2)])
    assert v.min() >= -1.0 - 1e-6 and v.max() <= 1.0 + 1e-6


def test_cornell_light_properties():
    s = cornell_box()
    em = np.asarray(s.emission[s.n_surfaces:])
    np.testing.assert_allclose(em, 14 * 0.9, atol=1e-6)
    lum = np.asarray(s.luminance[s.n_surfaces:])
    np.testing.assert_allclose(lum, 14 * 0.9, atol=1e-5)
    # lights live on the ceiling plane y = -1 + 2/555*555*? -> y = flipped:
    # original light verts have y = l (top) -> normalized 1 -> flipped -1.
    lv = np.asarray(s.v0[s.n_surfaces:])
    np.testing.assert_allclose(lv[:, 1], -1.0, atol=1e-6)


def test_cornell_normals_match_winding():
    s = cornell_box()
    n = triangle_normals(np.asarray(s.v0), np.asarray(s.v1), np.asarray(s.v2))
    np.testing.assert_allclose(n, np.asarray(s.normal), atol=1e-6)
    # floor (first two tris): original normal up (+y), flipped -> -y... the
    # green floor after the (-x,-y) flip sits at y=+1 with normal pointing
    # up into the room (-y).
    assert np.asarray(s.normal)[0, 1] < 0


def test_material_luminance():
    rgb = np.asarray([[0.75, 0.15, 0.15], [0.2, 0.5, 0.9]])
    np.testing.assert_allclose(luminance(rgb), [0.45, 0.55], atol=1e-7)


def test_triangle_area_and_sampling():
    v0 = np.asarray([[0.0, 0, 0]])
    v1 = np.asarray([[1.0, 0, 0]])
    v2 = np.asarray([[0.0, 1, 0]])
    np.testing.assert_allclose(triangle_areas(v0, v1, v2), [0.5], atol=1e-7)
    rng = np.random.default_rng(0)
    pts, idx = sample_points_on_triangles(rng, v0, v1, v2, np.asarray([5000]))
    assert pts.shape == (5000, 3)
    assert (idx == 0).all()
    # inside the triangle: x,y >= 0, x+y <= 1, z == 0
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-6).all()
    np.testing.assert_allclose(pts[:, 2], 0, atol=1e-7)
    # uniform: centroid ~ (1/3, 1/3)
    np.testing.assert_allclose(pts.mean(axis=0)[:2], [1 / 3, 1 / 3], atol=0.02)


def test_obj_importer_box():
    s = presets.load_scene("box")
    # box.obj has 57 face lines, mostly quads -> 114 triangles after the
    # reference's fan triangulation
    assert s.n_surfaces == 114
    assert s.n_lights == 2
    v = np.concatenate([np.asarray(s.v0), np.asarray(s.v1), np.asarray(s.v2)])
    # importer normalisation puts the pre-flip min corner at (-1,-1,-1)
    # (scale is the reference's literal 2.f with "/ max_difference" commented
    # out, object_importer.cu:119 — large models legitimately extend past
    # +1). After the (-x,-y,z) flip that corner becomes max x=1, max y=1,
    # min z=-1.
    assert abs(v[:, 0].max() - 1.0) < 1e-5
    assert abs(v[:, 1].max() - 1.0) < 1e-5
    assert abs(v[:, 2].min() + 1.0) < 1e-5


def test_obj_importer_archway_materials():
    s = presets.load_scene("archway")
    assert s.n_surfaces == 96  # 48 quad faces -> 96 triangles
    assert s.n_lights == 6     # three hard-coded light quads
    rgb = np.asarray(s.diffuse_c[: s.n_surfaces])
    # blue faces 12..23, red faces 81.. (ref: object_importer.cu:157-163)
    np.testing.assert_allclose(rgb[12], [0.15, 0.15, 0.75], atol=1e-6)
    np.testing.assert_allclose(rgb[23], [0.15, 0.15, 0.75], atol=1e-6)
    np.testing.assert_allclose(rgb[11], [0.75, 0.75, 0.75], atol=1e-6)
    np.testing.assert_allclose(rgb[81], [0.75, 0.15, 0.15], atol=1e-6)
    np.testing.assert_allclose(rgb[95], [0.75, 0.15, 0.15], atol=1e-6)


def test_obj_lights_in_obj():
    s = presets.load_scene("complex_light_room")
    assert s.n_lights == 24  # two 12-triangle ranges
    em = np.asarray(s.emission[s.n_surfaces:])
    np.testing.assert_allclose(em, 12.0, atol=1e-6)


def test_vertices_roundtrip(tmp_path):
    s = cornell_box()
    p = str(tmp_path / "vertices.txt")
    save_vertices_to_file(s, p)
    flat = load_vertices_from_file(p)
    assert flat.shape == (s.n_triangles * 9,)
    np.testing.assert_allclose(flat, np.asarray(s.vertices_flat), atol=1e-4)
