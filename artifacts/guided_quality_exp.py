"""R5 experiment: guided-mega quality + perf on a trained cornell map."""
import time, json, jax, numpy as np
import jax.numpy as jnp
from rlrpt_tpu.scene.presets import load_scene, get
from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig, RadianceVolumeConfig
from rlrpt_tpu.radiance.volumes import build_radiance_volumes, rebuild_cdf
from rlrpt_tpu.radiance.grid_bucket import build_volume_class_table
from rlrpt_tpu.radiance.bake import bake_tri_bin_cdf
from rlrpt_tpu.integrators.sarsa_wavefront import render_frame_sarsa_wavefront
from rlrpt_tpu.ops.megakernel import render_default_mega, mt_tables
from rlrpt_tpu.ops.guided_mega import render_guided_mega
from rlrpt_tpu.utils.profiling import host_fence
from rlrpt_tpu.utils.image import mape_score

def mape(img, gt):
    a = np.round(np.clip(np.asarray(img),0,1)*255.0)
    b = np.round(np.clip(np.asarray(gt),0,1)*255.0)
    return mape_score(b, a)

scene = load_scene("cornell").to_device()
cam = Camera.create(get("cornell").camera_position)
rl = RadianceVolumeConfig()
key = jax.random.PRNGKey(1984)
bounces = 80; size = 720
mk = lambda s: RenderConfig(width=size, height=size, samples_per_pixel=s, max_ray_bounces=bounces)
res = {}

# ---- frame-time protocol: chained reps, one fence ----
def frame_time(fn, reps=10, warm=2):
    for _ in range(warm):
        out = fn(jax.random.PRNGKey(0)); host_fence(out[0])
    acc = jnp.float32(0.0); t0=time.perf_counter()
    paths=[]
    for i in range(reps):
        img, aux = fn(jax.random.PRNGKey(10+i)); acc = acc + jnp.sum(img)
        paths.append(aux["avg_path_length"])
    float(acc)
    dt = (time.perf_counter()-t0)/reps
    return dt, float(np.mean([float(p) for p in paths]))

# default tuned
dt_def, path_def = frame_time(lambda k: render_default_mega(k, scene, cam, mk(1), r_tile=1024, pix_mux=32))
print("default mega: %.2f ms/spp-frame, path %.2f, %.0fM seg/s" % (dt_def*1e3, path_def, path_def*size*size/dt_def/1e6), flush=True)

# ---- train SARSA exactly like EVAL ----
vols = build_radiance_volumes(scene, rl)
grid = build_volume_class_table(vols, scene)
t0=time.perf_counter()
for f in range(10):
    for c in range(4):  # 4 chunks x 8 spp = 32
        _, vols, _ = render_frame_sarsa_wavefront(
            jax.random.fold_in(key, 100+f*4+c), scene, cam, vols, grid,
            mk(8), rl, pix_mux=4)
        host_fence(vols.q)
train_dt = time.perf_counter()-t0
print("sarsa train 10f x 32spp: %.1fs, V=%d" % (train_dt, vols.n_volumes), flush=True)

# ---- GT ----
def render_gt(spp=4096):
    acc=None
    for c in range(spp//256):
        img,_ = render_default_mega(jax.random.fold_in(key, 999+c), scene, cam,
                                    mk(256), r_tile=1024, pix_mux=8, precision="highest")
        acc = img*256 if acc is None else acc+img*256
        host_fence(acc)
    return acc/spp
t0=time.perf_counter(); gt = render_gt(); gt_dt=time.perf_counter()-t0
print("GT 4096spp: %.1fs" % gt_dt, flush=True)

g,_ = mt_tables(scene); t_pad = g.shape[0]//4

for ub, sg in ((4,11),(8,11)):
    tb = bake_tri_bin_cdf(scene, vols, rl, t_pad, uv_bins=ub, sector_grid=sg)
    # tune: frame time at two tunings
    for (rt, pm) in ((1024,32),(2048,8)):
        dt_g, path_g = frame_time(lambda k: render_guided_mega(k, scene, cam, tb, mk(1), r_tile=rt, pix_mux=pm), reps=6)
        print("guided ub=%d rt=%d pm=%d: %.2f ms/spp, path %.2f, %.0fM seg/s" %
              (ub, rt, pm, dt_g*1e3, path_g, path_g*size*size/dt_g/1e6), flush=True)
        res[f"guided_ub{ub}_rt{rt}_pm{pm}"] = dict(ms_per_spp=dt_g*1e3, path=path_g)
    # quality: 128 spp in 32-spp chunks
    def render_guided_test(spp=128, rt=1024, pm=32):
        acc=None
        for c in range(spp//32):
            img,_ = render_guided_mega(jax.random.fold_in(key, 2000+c), scene, cam, tb, mk(32), r_tile=rt, pix_mux=pm)
            acc = img*32 if acc is None else acc+img*32
            host_fence(acc)
        return acc/spp
    t0=time.perf_counter(); img_g = render_guided_test(); g_dt=time.perf_counter()-t0
    m = mape(img_g, gt)
    print("guided ub=%d 128spp: MAPE %.4f, render %.1fs" % (ub, m, g_dt), flush=True)
    res[f"guided_ub{ub}_quality"] = dict(mape=m, render_sec=g_dt)

# default at 128 spp (sample-budget row) and equal-time row
def render_default_test(spp):
    acc=None; left=spp
    while left>0:
        cs=min(128,left)
        img,_ = render_default_mega(jax.random.fold_in(key, 3000+left), scene, cam, mk(cs), r_tile=1024, pix_mux=32)
        acc = img*cs if acc is None else acc+img*cs; host_fence(acc); left-=cs
    return acc/spp
t0=time.perf_counter(); img_d = render_default_test(128); d_dt=time.perf_counter()-t0
print("default 128spp: MAPE %.4f, %.1fs" % (mape(img_d, gt), d_dt), flush=True)
res["default_128"] = dict(mape=mape(img_d,gt), render_sec=d_dt)
# equal-time: spp for default matching guided ub4 render time
eq_spp = max(1, int(round(res["guided_ub4_quality"]["render_sec"]/ (d_dt/128))))
t0=time.perf_counter(); img_e = render_default_test(eq_spp); e_dt=time.perf_counter()-t0
print("default equal-time %dspp: MAPE %.4f, %.1fs" % (eq_spp, mape(img_e, gt), e_dt), flush=True)
res["default_eqtime"] = dict(spp=eq_spp, mape=mape(img_e,gt), render_sec=e_dt)
res["train_sec"]=train_dt
json.dump(res, open("/root/repo/artifacts/guided_quality_exp.json","w"), indent=1)
print(json.dumps(res))
