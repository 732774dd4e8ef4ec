import time, json, jax, numpy as np, jax.numpy as jnp
from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig, RadianceVolumeConfig
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.ops.megakernel import mt_tables
from rlrpt_tpu.ops.guided_mega import render_guided_mega
from rlrpt_tpu.ops.guided_mega_train import (init_bin_q, rebuild_bin_cdf,
                                             render_sarsa_mega_train)
from rlrpt_tpu.utils.profiling import host_fence
from rlrpt_tpu.utils.image import mape_score

def mape(img, gt):
    a = np.round(np.clip(np.asarray(img),0,1)*255.0)
    b = np.round(np.clip(np.asarray(gt),0,1)*255.0)
    return mape_score(b, a)

key = jax.random.PRNGKey(77)
scene = cornell_box().to_device(); cam = Camera.create([0.,0.,-3.])
gt = jnp.asarray(np.load("artifacts/gt_cache/gt_cornell_720_4096_80.npz")["gt"])
mk = lambda s: RenderConfig(width=720, height=720, samples_per_pixel=s, max_ray_bounces=80)
rl = RadianceVolumeConfig(grid_resolution=11)
t_pad = mt_tables(scene)[0].shape[0]//4
out = {}
for frames, mix in ((20, 0.125), (20, 0.0625)):
    q, vis = init_bin_q(t_pad, 4, 11, rl.initial_radiance)
    tb = rebuild_bin_cdf(q, 11, 4, t_pad, defensive_mix=mix)
    host_fence(render_sarsa_mega_train(jax.random.fold_in(key,599), scene, cam,
        tb, q, vis, mk(32), rl.radiance_threshold)[1])
    t0=time.perf_counter()
    for f in range(frames):
        _, q, vis, _ = render_sarsa_mega_train(jax.random.fold_in(key,600+f),
            scene, cam, tb, q, vis, mk(32), rl.radiance_threshold)
        tb = rebuild_bin_cdf(q, 11, 4, t_pad, defensive_mix=mix)
        host_fence(q)
    train_dt = time.perf_counter()-t0
    host_fence(render_guided_mega(jax.random.fold_in(key,6999), scene, cam, tb,
        mk(128), r_tile=1024, pix_mux=32)[0])
    acc, n = None, 0
    t0=time.perf_counter()
    while time.perf_counter()-t0 < 60.0 - train_dt:
        img,_ = render_guided_mega(jax.random.fold_in(key,7000+n), scene, cam,
            tb, mk(128), r_tile=1024, pix_mux=32)
        acc = img*128 if acc is None else acc+img*128; n += 128
        host_fence(acc)
    r_dt = time.perf_counter()-t0
    k = f"f{frames}_mix{mix}"
    out[k] = dict(mape=round(mape(acc/n, gt),4), spp=n,
                  train_sec=round(train_dt,2), render_sec=round(r_dt,2))
    print(k, out[k], flush=True)
json.dump(out, open("artifacts/r5_budget_push.json","w"), indent=1)
