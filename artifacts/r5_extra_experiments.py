"""Two targeted experiments: (1) defensive-mix bake for the cornell 60s
budget shootout; (2) complex_light_room deep-Q with doubled sample budget."""
import time, json, jax, numpy as np, jax.numpy as jnp
from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig, RadianceVolumeConfig, DeepLearningConfig
from rlrpt_tpu.scene import cornell_box, presets
from rlrpt_tpu.ops.megakernel import mt_tables, render_default_mega
from rlrpt_tpu.ops.guided_mega import render_guided_mega
from rlrpt_tpu.ops.guided_mega_train import (init_bin_q, rebuild_bin_cdf,
                                             render_sarsa_mega_train)
from rlrpt_tpu.utils.profiling import host_fence
from rlrpt_tpu.utils.image import mape_score

def mape(img, gt):
    a = np.round(np.clip(np.asarray(img),0,1)*255.0)
    b = np.round(np.clip(np.asarray(gt),0,1)*255.0)
    return mape_score(b, a)

out = {}
key = jax.random.PRNGKey(1984)

# ---- (1) cornell budget shootout with defensive-mix bake ----
scene = cornell_box().to_device(); cam = Camera.create([0.,0.,-3.])
gt = jnp.asarray(np.load("artifacts/gt_cache/gt_cornell_720_4096_80.npz")["gt"])
mk = lambda s: RenderConfig(width=720, height=720, samples_per_pixel=s, max_ray_bounces=80)
rl = RadianceVolumeConfig(grid_resolution=11)
t_pad = mt_tables(scene)[0].shape[0]//4
for mix in (0.125,):
    q, vis = init_bin_q(t_pad, 4, 11, rl.initial_radiance)
    tb = rebuild_bin_cdf(q, 11, 4, t_pad, defensive_mix=mix)
    host_fence(render_sarsa_mega_train(jax.random.fold_in(key,599), scene, cam,
        tb, q, vis, mk(32), rl.radiance_threshold)[1])
    t0=time.perf_counter()
    for f in range(10):
        _, q, vis, _ = render_sarsa_mega_train(jax.random.fold_in(key,600+f),
            scene, cam, tb, q, vis, mk(32), rl.radiance_threshold)
        tb = rebuild_bin_cdf(q, 11, 4, t_pad, defensive_mix=mix)
        host_fence(q)
    train_dt = time.perf_counter()-t0
    # budget render (60s total incl train)
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
    m = mape(acc/n, gt)
    out[f"cornell_mega_budget_mix{mix}"] = dict(
        mape=round(m,4), spp=n, train_sec=round(train_dt,2),
        render_sec=round(r_dt,2), budget_sec=60.0)
    print("cornell mix", mix, out[f"cornell_mega_budget_mix{mix}"], flush=True)

# ---- (2) complex_light_room deep-Q, 24 frames x 16 spp ----
from rlrpt_tpu.deep.neural_q import init_neural_q
from rlrpt_tpu.deep.deep_wavefront import (render_frame_neural_q_wavefront,
                                           render_frame_pretrained_wavefront)
p = presets.get("complex_light_room")
scene2, cam2 = p.load().to_device(), Camera.create(p.camera_position)
gt2 = jnp.asarray(np.load("artifacts/gt_cache/gt_complex_light_room_720_4096_80.npz")["gt"])
rl2 = RadianceVolumeConfig()
dl = DeepLearningConfig()
params, opt = init_neural_q(jax.random.fold_in(key, 7), scene2, dl, rl2.grid_resolution)
eps = 0.05
t0=time.perf_counter()
for f in range(24):
    for c in range(2):  # 2 x 8 spp = 16 spp/frame
        _, params, opt, eps, aux = render_frame_neural_q_wavefront(
            jax.random.fold_in(key, 300 + f*2 + c), scene2, cam2, params, opt,
            eps, mk(8), rl2, dl)
        host_fence(params)
train_dt = time.perf_counter()-t0
acc=None
for c in range(2):
    img,_ = render_frame_pretrained_wavefront(jax.random.fold_in(key, 3100+c),
        scene2, cam2, params, mk(64), rl2, dl)
    acc = img*64 if acc is None else acc+img*64
    host_fence(acc)
m2 = mape(acc/128, gt2)
out["complex_nq_24f_16spp"] = dict(mape=round(m2,4), train_frames=24,
    train_spp=16, train_sec=round(train_dt,2))
print("complex nq 24x16:", out["complex_nq_24f_16spp"], flush=True)
json.dump(out, open("artifacts/r5_extra_experiments.json","w"), indent=1)
