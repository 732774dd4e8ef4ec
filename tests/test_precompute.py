"""CPU-engine-extra tests: k-NN interpolation, precompute modes."""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RHO, RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.integrators.precompute import (precompute_radiance_grids,
                                              render_importance_sampled,
                                              render_precomputed_irradiance)
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.radiance.interpolation import (barycentric_uvw,
                                              find_k_closest_volumes,
                                              interpolated_irradiance,
                                              volume_irradiance_rgb)
from rlrpt_tpu.radiance.volumes import build_radiance_volumes
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=24, height=24, samples_per_pixel=2,
                    max_ray_bounces=4, ray_tile=1024)
_RL = RadianceVolumeConfig(area_per_sample=0.05, grid_resolution=6)


def test_k_closest_respects_normal_and_distance():
    scene = cornell_box()
    vols = build_radiance_volumes(scene, _RL)
    q = np.asarray(vols.position[:4])
    n = np.asarray(vols.normal[:4])
    idx, valid = find_k_closest_volumes(vols, jnp.asarray(q), jnp.asarray(n),
                                        k=3, max_dist=0.5)
    idx, valid = np.asarray(idx), np.asarray(valid)
    # the query IS a volume position -> nearest match is itself
    assert (idx[:, 0] == np.arange(4)).all()
    assert valid[:, 0].all()
    # all returned valid volumes share the query normal
    vn = np.asarray(vols.normal)
    for i in range(4):
        for j in range(3):
            if valid[i, j]:
                np.testing.assert_allclose(vn[idx[i, j]], n[i])


def test_volume_irradiance_formula():
    scene = cornell_box()
    vols = build_radiance_volumes(scene, _RL)
    rgb = jnp.asarray([[0.5, 0.25, 1.0]])
    out = np.asarray(volume_irradiance_rgb(vols, jnp.asarray([0]), rgb))[0]
    cos = np.asarray(hs.sector_cos_thetas(_RL.grid_resolution))
    q = np.asarray(vols.q[0])
    expected = (q * cos).sum() / (_RL.n_sectors * RHO) * np.asarray(rgb[0])
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_barycentric_interior_point():
    a = jnp.asarray([[0.0, 0, 0]])
    b = jnp.asarray([[1.0, 0, 0]])
    c = jnp.asarray([[0.0, 1, 0]])
    p = jnp.asarray([[0.25, 0.25, 0.0]])
    u, v, w = barycentric_uvw(a, b, c, p)
    np.testing.assert_allclose(float(u[0] + v[0] + w[0]), 1.0, atol=1e-5)
    # The reference's formula (interpolation.cpp:6-19) yields PERMUTED
    # weights: u = area(C,A,P) is vertex B's weight, v = area(A,B,P) is
    # vertex C's, w = area(B,C,P) is vertex A's — so the true identity is
    # p = w*a + u*b + v*c.  (The reference then combines u*c0+v*c1+w*c2,
    # a faithful quirk of its interpolation.)
    rec = w[0] * a[0] + u[0] * b[0] + v[0] * c[0]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(p[0]), atol=1e-5)


def test_precompute_and_render_modes():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    vols = build_radiance_volumes(scene, _RL)
    vols = precompute_radiance_grids(jax.random.PRNGKey(0), scene, vols,
                                     _CFG, spp=2)
    q = np.asarray(vols.q)
    assert np.isfinite(q).all() and q.max() > 0.0
    # grids differ between a ceiling volume and a floor volume
    assert q.std() > 0.0

    img = render_precomputed_irradiance(jax.random.PRNGKey(1), scene, cam,
                                        vols, _CFG)
    img = np.asarray(img)
    assert img.shape == (24, 24, 3) and np.isfinite(img).all()
    assert img.max() > 0.0

    img2, _ = render_importance_sampled(jax.random.PRNGKey(2), scene, cam,
                                        vols, _CFG, _RL)
    img2 = np.asarray(img2)
    assert img2.shape == (24, 24, 3) and np.isfinite(img2).all()
    assert img2.mean() > 0.0


def test_volume_visualization_mesh():
    from rlrpt_tpu.radiance.visualize import (inject_volumes_into_scene,
                                              volumes_to_surfaces)
    scene = cornell_box()
    vols = build_radiance_volumes(scene, _RL)
    v0, v1, v2, rgb = volumes_to_surfaces(vols, indices=[0, 1])
    s = _RL.n_sectors
    assert v0.shape == (2 * 2 * s, 3) and rgb.shape == (2 * 2 * s, 3)
    # colours are (ratio, 1-ratio, 0)
    np.testing.assert_allclose(rgb[:, 0] + rgb[:, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(rgb[:, 2], 0.0)
    # mesh vertices sit on the DIAMETER-scaled hemisphere shell
    c = np.asarray(vols.position[0])
    r = np.linalg.norm(v0[:s] - c, axis=-1)
    assert (r <= 0.15 + 1e-5).all()
    s2 = inject_volumes_into_scene(scene, vols, indices=[0])
    assert s2.n_surfaces == scene.n_surfaces + 2 * s
    assert s2.n_lights == scene.n_lights
