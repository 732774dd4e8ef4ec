"""Russian-roulette termination (BASELINE.json config #3).

RR is an optional unbiased accelerator the reference lacks (paths there die
only on miss / light hit / bounce cap, monte_carlo_settings.h:8): from
rr_start_bounce on, survivors continue with p = clip(max(throughput),
rr_min_prob, 1) and are reweighted by 1/p.  These tests check (a) the
estimator stays unbiased (mean image matches the RR-off render within Monte
Carlo noise) and (b) paths actually get shorter, on all three integrators
that support it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.integrators.reinforcement_tracer import render_frame_sarsa
from rlrpt_tpu.integrators.wavefront import render_wavefront
from rlrpt_tpu.radiance.volumes import build_radiance_volumes
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=32, height=32, samples_per_pixel=24,
                    max_ray_bounces=24, ray_tile=1024)
_RR = dataclasses.replace(_CFG, russian_roulette=True, rr_start_bounce=3,
                          rr_min_prob=0.1)
_CAM = Camera.create([0.0, 0.0, -3.0])


def _mean_err(a, b):
    return float(jnp.mean(jnp.abs(a - b)))


def test_rr_default_tracer_unbiased_and_shorter():
    scene = cornell_box()
    img_off, aux_off = render_default(jax.random.PRNGKey(7), scene, _CAM, _CFG)
    img_on, aux_on = render_default(jax.random.PRNGKey(7), scene, _CAM, _RR)
    # Monte-Carlo noise floor: two independent RR-off renders.
    img_off2, _ = render_default(jax.random.PRNGKey(8), scene, _CAM, _CFG)
    noise = _mean_err(img_off, img_off2)
    assert _mean_err(img_on, img_off) < 3.0 * noise + 1e-3
    assert float(aux_on["avg_path_length"]) < float(aux_off["avg_path_length"])


def test_rr_wavefront_unbiased_and_shorter():
    scene = cornell_box()
    img_off, aux_off = render_wavefront(jax.random.PRNGKey(7), scene, _CAM,
                                        _CFG, interpret=True)
    img_on, aux_on = render_wavefront(jax.random.PRNGKey(7), scene, _CAM, _RR,
                                      interpret=True)
    img_off2, _ = render_wavefront(jax.random.PRNGKey(9), scene, _CAM, _CFG,
                                   interpret=True)
    noise = _mean_err(img_off, img_off2)
    assert _mean_err(img_on, img_off) < 3.0 * noise + 1e-3
    assert float(aux_on["avg_path_length"]) < float(aux_off["avg_path_length"])


def test_rr_sarsa_tracer_runs_and_shortens_paths():
    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.05, max_volumes=256)
    vols = build_radiance_volumes(scene, rl)
    _, _, aux_off = render_frame_sarsa(jax.random.PRNGKey(7), scene, _CAM,
                                       vols, _CFG, rl)
    img_on, _, aux_on = render_frame_sarsa(jax.random.PRNGKey(7), scene, _CAM,
                                           vols, _RR, rl)
    assert float(aux_on["avg_path_length"]) < float(aux_off["avg_path_length"])
    assert bool(jnp.all(jnp.isfinite(img_on)))


def test_rr_off_is_bitwise_default():
    """With russian_roulette=False the rr_* knobs must not change the result.

    Full stream preservation (RR-off renders bitwise-identical to a renderer
    with no RR code at all) holds by construction: the RR key is drawn inside
    a static `if cfg.russian_roulette:` branch, so the threefry split count —
    and hence every downstream sample — is unchanged when RR is off.
    test_rr_off_key_stream_matches_plain_split checks that split behaviour
    directly.
    """
    scene = cornell_box()
    cfg_small = dataclasses.replace(_CFG, samples_per_pixel=4,
                                    max_ray_bounces=8)
    a, _ = render_default(jax.random.PRNGKey(3), scene, _CAM, cfg_small)
    b, _ = render_default(jax.random.PRNGKey(3), scene, _CAM,
                          dataclasses.replace(cfg_small, rr_start_bounce=5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rr_off_key_stream_matches_plain_split():
    """RR-off bounce loops must consume keys as split(key, 2), not (key, 3).

    Reproduces the first bounce of trace_sample's key schedule and checks the
    direction actually used is the one a plain 2-way split yields (threefry
    split output depends on the count, so a stray 3-way split would diverge).
    """
    from rlrpt_tpu.camera import primary_rays
    from rlrpt_tpu.ops.hemisphere import sample_uniform_direction
    from rlrpt_tpu.ops.intersect import closest_hit
    from rlrpt_tpu.integrators.default_tracer import trace_sample

    scene = cornell_box()
    cfg = dataclasses.replace(_CFG, samples_per_pixel=1, max_ray_bounces=2)
    key = jax.random.PRNGKey(11)
    o, d = primary_rays(jax.random.PRNGKey(0), _CAM, cfg.width, cfg.height,
                        cfg.focal)

    # Expected bounce-2 origin using the plain 2-way split schedule.
    hit = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
    _, sub = jax.random.split(key)
    new_d, _ = sample_uniform_direction(sub, hit.normal)
    # One-bounce trace: radiance of a 2-bounce trace differs from a 1-bounce
    # trace exactly through new_d; check via a light-hit probe instead —
    # simpler: rerun trace_sample twice, once with max 1 and once with max 2
    # bounces; the delta must equal the contribution along new_d.
    rad2, _ = trace_sample(key, o, d, scene, cfg)
    rad1, _ = trace_sample(key, o, d, scene,
                           dataclasses.replace(cfg, max_ray_bounces=1))
    hit2 = closest_hit(hit.position + cfg.eps * new_d, new_d, scene,
                       ray_tile=cfg.ray_tile)
    expects_light = np.asarray(hit2.hit_type == 1)  # AREA_LIGHT
    delta = np.asarray(jnp.any(rad2 != rad1, axis=-1))
    surface_first = np.asarray(hit.hit_type == 2)
    # Wherever the first hit was a surface, a bounce-2 light hit along the
    # predicted new_d must be exactly where the 2-bounce render gained energy.
    np.testing.assert_array_equal(delta & surface_first,
                                  expects_light & surface_first)


def test_rr_megakernel_unbiased_and_shorter():
    """Megakernel RR: unbiased within MC noise vs its own RR-off render and
    measurably shorter paths (the in-kernel draw uses a dedicated RNG
    stream, so the RR-off image is untouched by the rr_* knobs)."""
    from rlrpt_tpu.ops.megakernel import render_default_mega

    scene = cornell_box()
    kw = dict(r_tile=256, pix_mux=4, interpret=True)
    img_off, aux_off = render_default_mega(jax.random.PRNGKey(7), scene,
                                           _CAM, _CFG, **kw)
    img_on, aux_on = render_default_mega(jax.random.PRNGKey(7), scene,
                                         _CAM, _RR, **kw)
    img_off2, _ = render_default_mega(jax.random.PRNGKey(9), scene,
                                      _CAM, _CFG, **kw)
    noise = _mean_err(img_off, img_off2)
    assert _mean_err(img_on, img_off) < 3.0 * noise + 1e-3
    assert float(aux_on["avg_path_length"]) < float(aux_off["avg_path_length"])


def test_rr_megakernel_off_ignores_rr_knobs():
    """RR-off megakernel renders are bitwise independent of the rr_* knobs
    (the whole RR block is a static `if russian_roulette:`)."""
    import dataclasses as dc

    from rlrpt_tpu.ops.megakernel import render_default_mega

    scene = cornell_box()
    cfg_small = dc.replace(_CFG, samples_per_pixel=4, max_ray_bounces=8)
    kw = dict(r_tile=256, pix_mux=4, interpret=True)
    a, _ = render_default_mega(jax.random.PRNGKey(3), scene, _CAM,
                               cfg_small, **kw)
    b, _ = render_default_mega(jax.random.PRNGKey(3), scene, _CAM,
                               dc.replace(cfg_small, rr_start_bounce=7,
                                          rr_min_prob=0.5), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
