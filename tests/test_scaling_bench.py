"""Scaling-efficiency harness (BASELINE north-star: rays/s at 1..N devices).

On the virtual CPU mesh all devices share host cores, so no real speedup is
expected — the test checks the harness exercises the sharded render path at
multiple mesh sizes and reports consistent numbers.
"""

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.tools.scaling_bench import run_scaling

def test_run_scaling_reports_all_sizes():
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=1,
                       max_ray_bounces=6, ray_tile=1024)
    res = run_scaling(cornell_box(), Camera.create([0.0, 0.0, -3.0]), cfg,
                      sizes=[1, 2, 8], repeats=1)
    assert [r["devices"] for r in res] == [1, 2, 8]
    for r in res:
        assert r["rays_per_sec"] > 0
        assert r["seconds"] > 0
        assert abs(r["rays_per_sec_per_device"] * r["devices"]
                   - r["rays_per_sec"]) < 1e-6 * r["rays_per_sec"] + 1e-9
    assert res[0]["speedup"] == 1.0 and res[0]["efficiency"] == 1.0


def test_run_scaling_weak_mode():
    """Weak mode scales the frame with the mesh (fixed per-device work);
    ideal per-device time is flat, so weak_efficiency ~ t(1)/t(d)."""
    cfg = RenderConfig(width=32, height=16, samples_per_pixel=1,
                       max_ray_bounces=6, ray_tile=1024)
    res = run_scaling(cornell_box(), Camera.create([0.0, 0.0, -3.0]), cfg,
                      sizes=[1, 2], repeats=1, mode="weak")
    assert [r["devices"] for r in res] == [1, 2]
    assert res[0]["pixels"] * 2 == res[1]["pixels"]
    assert res[0]["weak_efficiency"] == 1.0
    assert res[1]["weak_efficiency"] > 0
    assert all(r["mode"] == "weak" for r in res)
