"""Single-pass Pallas TPU megakernel for the default path tracer.

The reference's per-pixel CUDA kernel (one thread owns a pixel and walks
its own bounce loop, GPU_Rendering_Engine/Source/path_tracing/
default_path_tracing.cu:36-88) becomes ONE pallas_call for the whole
frame: the grid walks ray tiles; each tile keeps its entire ray state in
VMEM/registers and runs the full sample-and-bounce loop in-kernel — zero
HBM round-trips between bounces, in-kernel PRNG, and per-tile early exit
the moment every slot has finished all its samples (sample regeneration:
a slot starts its pixel's next sample the moment the previous one dies).

Intersection is reformulated for the MXU: for a fixed triangle, each of
the four Moller-Trumbore determinants is LINEAR in the 16-vector of ray
features f = [o, d, o (x) d, 1]:

    det = d . (e2 x e1)
    u'  = sum_ij o_i d_j eps_ijk e2_k  -  d . (e2 x v0)
    v'  = sum_kj o_k d_j eps_jkl e1_l  -  d . (v0 x e1)
    t'  = o . (e1 x e2)                -  v0 . (e1 x e2)

so the whole (rays x triangles) sweep is a single f32 matmul
(4T, 16) @ (16, R) on the systolic array, followed by a cheap VPU
epilogue (sign tests against det — no divisions except one reciprocal
for the returned t).  u = u'/det etc. recovers the classic test exactly:
u >= 0  <=>  u' * det >= 0, and u + v <= 1  <=>  (u'+v') * det <= det^2.

Material/normal lookup is a one-hot matmul against a packed (16, T)
table — no gathers (TPU scatters/gathers serialise; matmuls don't).

Statistically identical to integrators.default_tracer (same estimator,
same per-event probabilities); the RNG consumption ORDER differs, so
images match in distribution (MAPE), not bitwise — the reference's
cuRAND streams are equally irreproducible (SURVEY §7 "RNG parity").
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.scene.scene import Scene

INF = 3.0e38
PI = math.pi
R_TILE = 2048      # rays (lanes) per grid step
T_CHUNK = 256      # max triangles per matmul chunk (sublanes)

#: Matmul precision modes for the intersection sweep.  "highest" = 6-pass
#: bf16 (f32-exact), "default" = 1 native bf16 pass (fast, ~4e-3 relative
#: error — visibly biased at edges), "high3" = MANUAL compensated bf16
#: (hi/lo split of both operands, dropping only the lo*lo term: ~1.5e-5
#: relative, the classic Precision.HIGH algorithm, which Mosaic does not
#: expose — "Unsupported dot precision: HIGH").  The three compensated
#: partial products Gh*fh + Gh*fl + Gl*fh are evaluated as ONE matmul
#: [Gh|Gh|Gl] @ [fh;fl;fh] with K=48: the MXU zero-pads the contraction
#: dim to 128 either way, so the fused form costs one pass, not three
#: (and likewise the hi/lo material fetch fuses into one M=32 pass).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high3": None,  # handled structurally (compensated operands)
    "highest": jax.lax.Precision.HIGHEST,
}


def _split_bf16(a: jnp.ndarray):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ a (16-bit mantissa)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _t_pad(n_tris: int) -> int:
    t8 = max(8, int(math.ceil(n_tris / 8) * 8))
    return min(T_CHUNK, t8) if t8 <= T_CHUNK else int(
        math.ceil(n_tris / T_CHUNK) * T_CHUNK)


def mt_tables(scene: Scene):
    """Pack per-triangle Moller-Trumbore coefficient rows and the material
    table.

    Returns (G (4*T_pad, 16) float32, mtbl (16, T_pad) float32).
    G rows are grouped [det | u' | v' | t'], each group T_pad rows; padding
    rows are all-zero => det == 0 => never a valid hit.  Feature order:
    f = [o(3), d(3), (o_i d_j) row-major (9), 1].
    mtbl rows: 0-2 normal, 3-5 diffuse_c, 6-8 emission, 9 is_light,
    10 luminance, 11-15 0 (row 11 carries the normal-class id when packed
    by intersect_pallas.pack_scene_mxu for the SARSA fast path).
    """
    v0 = jnp.asarray(scene.v0, jnp.float32)
    e1 = jnp.asarray(scene.v1, jnp.float32) - v0
    e2 = jnp.asarray(scene.v2, jnp.float32) - v0
    t = v0.shape[0]
    tp = _t_pad(t)

    zeros = jnp.zeros((t,), jnp.float32)

    def odij(mat9):  # list of 9 (T,) entries, row-major (o_i d_j)
        return jnp.stack(mat9, axis=1)

    # det = d . (e2 x e1)
    c1 = jnp.cross(e2, e1)
    g_det = jnp.concatenate(
        [jnp.zeros((t, 3)), c1, jnp.zeros((t, 9)), jnp.zeros((t, 1))], axis=1)

    # u' : o_i d_j coeff U[i,j] = eps_ijk e2_k ; d coeff = -(e2 x v0)
    e2x, e2y, e2z = e2[:, 0], e2[:, 1], e2[:, 2]
    u_od = odij([zeros, e2z, -e2y,
                 -e2z, zeros, e2x,
                 e2y, -e2x, zeros])
    g_u = jnp.concatenate(
        [jnp.zeros((t, 3)), -jnp.cross(e2, v0), u_od, jnp.zeros((t, 1))],
        axis=1)

    # v' : o_k d_j coeff V[k,j] = eps_jkl e1_l ; d coeff = -(v0 x e1)
    e1x, e1y, e1z = e1[:, 0], e1[:, 1], e1[:, 2]
    v_od = odij([zeros, -e1z, e1y,
                 e1z, zeros, -e1x,
                 -e1y, e1x, zeros])
    g_v = jnp.concatenate(
        [jnp.zeros((t, 3)), -jnp.cross(v0, e1), v_od, jnp.zeros((t, 1))],
        axis=1)

    # t' : o coeff = e1 x e2 ; constant = -(v0 . (e1 x e2))
    c3 = jnp.cross(e1, e2)
    g_t = jnp.concatenate(
        [c3, jnp.zeros((t, 3)), jnp.zeros((t, 9)),
         -jnp.sum(v0 * c3, axis=1, keepdims=True)], axis=1)

    def padt(a):
        return jnp.pad(a, ((0, tp - t), (0, 0)))

    # Row layout: per triangle-chunk, the four quantity groups are
    # contiguous — chunk c occupies rows [4*c*t_chunk, 4*(c+1)*t_chunk) as
    # [det | u' | v' | t'] — so the kernel sweeps a chunk with ONE matmul.
    t_chunk = min(tp, T_CHUNK)
    n_chunks = tp // t_chunk
    g = jnp.stack([padt(g_det), padt(g_u), padt(g_v), padt(g_t)],
                  axis=0).astype(jnp.float32)              # (4, tp, 16)
    g = (g.reshape(4, n_chunks, t_chunk, 16)
         .transpose(1, 0, 2, 3)
         .reshape(4 * tp, 16))

    is_light = (jnp.arange(t) >= scene.n_surfaces).astype(jnp.float32)
    mtbl = jnp.concatenate([
        jnp.asarray(scene.normal, jnp.float32).T,
        jnp.asarray(scene.diffuse_c, jnp.float32).T,
        jnp.asarray(scene.emission, jnp.float32).T,
        is_light[None, :],
        jnp.asarray(scene.luminance, jnp.float32)[None, :],
        jnp.zeros((5, t), jnp.float32),
    ], axis=0)
    mtbl = jnp.pad(mtbl, ((0, 0), (0, tp - t)))
    return g, mtbl


def chunk_aabbs(scene: Scene, t_pad: int, t_chunk: int) -> jnp.ndarray:
    """Per-triangle-chunk AABBs for the multi-chunk pre-reject.

    Returns (n_chunks, 8) f32 rows [lo(3), hi(3), 0, 0] over each chunk's
    REAL triangles only; a chunk of pure padding gets an empty box
    (lo = +INF, hi = -INF) that no ray can hit.  Used as a scalar-prefetch
    (SMEM) input so the kernel reads per-chunk bounds as scalars.
    jnp throughout (scene arrays may be traced under jit).
    """
    t = scene.v0.shape[0]
    n_chunks = t_pad // t_chunk
    v = jnp.stack([jnp.asarray(scene.v0, jnp.float32),
                   jnp.asarray(scene.v1, jnp.float32),
                   jnp.asarray(scene.v2, jnp.float32)], axis=1)  # (T, 3, 3)
    vmin = jnp.pad(v.min(axis=1), ((0, t_pad - t), (0, 0)),
                   constant_values=INF)
    vmax = jnp.pad(v.max(axis=1), ((0, t_pad - t), (0, 0)),
                   constant_values=-INF)
    lo = vmin.reshape(n_chunks, t_chunk, 3).min(axis=1)
    hi = vmax.reshape(n_chunks, t_chunk, 3).max(axis=1)
    return jnp.concatenate([lo, hi, jnp.zeros((n_chunks, 2))],
                           axis=1).astype(jnp.float32)


def _i32(v: int) -> jnp.ndarray:
    """Python uint32 literal as a wrapping int32 constant."""
    v &= 0xFFFFFFFF
    return jnp.int32(v - 0x100000000 if v >= 0x80000000 else v)


def _hash32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 integer finalizer — a counter-based PRNG usable both
    compiled and in interpret mode (pltpu.prng_* has no CPU lowering;
    Mosaic has no uint32 casts, so this runs on wrapping int32, which is
    bit-identical to the uint32 version)."""
    shr = jax.lax.shift_right_logical
    x = x ^ shr(x, 16)
    x = x * _i32(0x7FEB352D)
    x = x ^ shr(x, 15)
    x = x * _i32(0x846CA68B)
    x = x ^ shr(x, 16)
    return x


def _uniform(seed, pix, it, stream: int):
    """float32 uniforms in [0, 1) keyed on (seed, pixel, iteration, stream)
    — bitwise reproducible for a base seed regardless of tiling."""
    x = (seed.astype(jnp.int32)
         + pix.astype(jnp.int32) * _i32(0x9E3779B9)
         + it.astype(jnp.int32) * _i32(0x85EBCA6B)
         + _i32(stream * 0xC2B2AE35))
    bits = _hash32(x)
    # top 24 bits -> [0, 2^24) fits int32 exactly -> exact float32
    return jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) \
        * jnp.float32(1.0 / 16777216.0)


def make_primary_fn(cam_ref, r: int, width: int, height: int, focal: float):
    """Shared jittered camera-ray generator over (1, r) lanes for the
    megakernel family (ref: ray.cu:145-172).  cam_ref layout: position(3),
    cos/sin yaw_y, cos/sin yaw_x (see render_default_mega's `cam`)."""
    cy, sy = cam_ref[0, 3], cam_ref[0, 4]
    cx, sx = cam_ref[0, 5], cam_ref[0, 6]
    half_w = jnp.float32(width / 2.0)
    half_h = jnp.float32(height / 2.0)

    def primary(pix, u1, u2):
        fpy = (pix // width).astype(jnp.float32)
        fpx = (pix - (pix // width) * width).astype(jnp.float32)
        dx = fpx + u1 - half_w
        dy = fpy + u2 - half_h
        dz = jnp.full((1, r), jnp.float32(focal))
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv
        x1 = cy * dx - sy * dz
        z1 = sy * dx + cy * dz
        y2 = cx * dy + sx * z1
        z2 = -sx * dy + cx * z1
        return x1, y2, z2

    return primary


def _mega_kernel(*refs,
                 t_pad: int, n_chunks: int, t_chunk: int, r_tile: int,
                 width: int, height: int, focal: float, n_pix: int,
                 spp: int, max_bounces: int, env: float, eps: float,
                 pix_mux: int, n_slots: int,
                 precision=jax.lax.Precision.HIGHEST, unroll: int = 2,
                 compensated: bool = False,
                 russian_roulette: bool = False, rr_start_bounce: int = 3,
                 rr_min_prob: float = 0.05, cull: bool = False,
                 cull_group: int = 1):
    if cull:
        (seed_ref, aabb_ref, cam_ref, g_ref, mtbl_ref, out_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tr_ref, tg_ref, tb_ref, ps_ref,
         bn_ref, rm_ref, ac_ref, px_ref, km_ref, sa_ref,
         bt_ref, mat_ref) = refs
    else:
        (seed_ref, cam_ref, g_ref, mtbl_ref, out_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tr_ref, tg_ref, tb_ref, ps_ref,
         bn_ref, rm_ref, ac_ref, px_ref, km_ref, sa_ref) = refs
        aabb_ref = bt_ref = mat_ref = None
    tile = pl.program_id(0)
    seed = seed_ref[0]

    r = r_tile
    k_mux = pix_mux
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    slot = tile * r + lane                               # (1, r)
    # slot's k-th pixel is slot + k * n_slots (k in [0, pix_mux))

    cpx = cam_ref[0, 0]
    cpy = cam_ref[0, 1]
    cpz = cam_ref[0, 2]
    cy, sy = cam_ref[0, 3], cam_ref[0, 4]
    cx, sx = cam_ref[0, 5], cam_ref[0, 6]

    zero = jnp.zeros((1, r), jnp.float32)
    one = jnp.ones((1, r), jnp.float32)
    primary = make_primary_fn(cam_ref, r, width, height, focal)

    def sample_hemi(u1, u2, nx, ny, nz):
        """Uniform hemisphere about the normal; returns dir + cos(theta)
        (ref: hemisphere_helpers.cu:8-25, :31-63)."""
        cost = u1
        sint = jnp.sqrt(jnp.maximum(1.0 - u1 * u1, 0.0))
        phi = jnp.float32(2.0 * PI) * u2
        lx = sint * jnp.cos(phi)
        lz = sint * jnp.sin(phi)
        use_x = jnp.abs(nx) > jnp.abs(ny)
        tx = jnp.where(use_x, nz, zero)
        ty = jnp.where(use_x, zero, -nz)
        tz = jnp.where(use_x, -nx, ny)
        tn = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz,
                                       jnp.float32(1e-30)))
        tx, ty, tz = tx * tn, ty * tn, tz * tn
        bx = ny * tz - nz * ty
        by = nz * tx - nx * tz
        bz = nx * ty - ny * tx
        dx = lx * bx + cost * nx + lz * tx
        dy = lx * by + cost * ny + lz * ty
        dz = lx * bz + cost * nz + lz * tz
        return dx, dy, dz, cost

    def intersect(ox, oy, oz, dx, dy, dz):
        """Closest hit via the (4T,16)@(16,R) MXU sweep; returns
        (best_t, mat (16, r)) where mat is the one-hot material fetch."""
        f = jnp.concatenate([
            ox, oy, oz, dx, dy, dz,
            ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            one,
        ], axis=0)                                        # (16, r)
        if compensated:
            # q = Gh fh + Gh fl + Gl fh (the dropped Gl*fl term is ~2^-16
            # relative), fused into ONE bf16 matmul: g_ref holds
            # [Gh | Gh | Gl] (4T, 48) and the ray operand is [fh; fl; fh]
            # (48, r).  K=48 zero-pads to the MXU's 128 contraction lanes
            # exactly like K=16 does, so this costs one pass, not three.
            f_hi, f_lo = _split_bf16(f)
            f = jnp.concatenate([f_hi, f_lo, f_hi], axis=0)   # (48, r)

        def mt_dot(c):
            ds = pl.ds(4 * c * t_chunk, 4 * t_chunk)
            if compensated:
                return jax.lax.dot_general(
                    g_ref[ds, :], f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return jax.lax.dot_general(
                g_ref[ds, :], f,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision)                      # (4*t_chunk, r)

        def mat_dot(onehot, c):
            ds = pl.ds(c * t_chunk, t_chunk)
            if compensated:
                # One-hot entries are exact in bf16; hi+lo recovers the
                # f32 material rows to rounding.  mtbl_ref stacks the hi
                # rows over the lo rows ((32, T)); one M=32 pass replaces
                # the two M=16 passes (M zero-pads to 128 either way).
                oh = onehot.astype(jnp.bfloat16)
                m2 = jax.lax.dot_general(
                    mtbl_ref[:, ds], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (32, r)
                return m2[:16] + m2[16:]
            return jax.lax.dot_general(
                mtbl_ref[:, ds], onehot,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision)

        def chunk_tt(c):
            """Per-triangle hit distance (INF when no hit) for chunk c.

            Moller-Trumbore sign tests multiplied through by det (det == 0
            is subsumed: it forces tq*det == 0 which fails the > 0 test);
            the div-by-zero inf/nan is discarded by the where.
            """
            q = mt_dot(c)
            det = q[0 * t_chunk:1 * t_chunk]
            up = q[1 * t_chunk:2 * t_chunk]
            vp = q[2 * t_chunk:3 * t_chunk]
            tq = q[3 * t_chunk:4 * t_chunk]
            a = up * det
            b = vp * det
            valid = ((a >= 0.0) & (b >= 0.0) & (a + b <= det * det)
                     & (tq * det > 0.0))
            return jnp.where(valid, tq / det, INF)         # (t_chunk, r)

        # One-hot by distance equality (tt == best_t) instead of triangle-id
        # tracking: saves a full iota/compare/min-reduce pass per chunk.
        # Exact float ties between DIFFERENT triangles would double-count
        # the material row; with jittered rays and distances produced by
        # per-triangle determinant ratios this is measure-zero (the
        # reference's first-tested-wins pick is equally arbitrary,
        # ray.cu:17-36).
        if n_chunks == 1:
            tt = chunk_tt(0)
            best_t = jnp.min(tt, axis=0, keepdims=True)
            onehot = ((tt == best_t) & (best_t < INF)).astype(jnp.float32)
            return best_t, mat_dot(onehot, 0)

        # Multi-chunk: ONE streaming pass with a running argmin — each
        # chunk resolves its own local winner (one-hot against the CHUNK
        # minimum), fetches its material row, and the (16, r) running `mat`
        # is overwritten wherever the chunk's minimum strictly improves the
        # global best (strict `<` keeps the lowest-indexed chunk on exact
        # cross-chunk ties, mirroring the reference's first-tested-wins
        # sweep, ray.cu:17-36).  Holding every chunk's (t_chunk, r) tt live
        # would scale VMEM with scene size; the old two-pass recompute
        # doubled the big matmuls instead — this does neither.
        if not cull:
            best_t = jnp.full((1, r), INF, jnp.float32)
            mat = jnp.zeros((16, r), jnp.float32)
            for c in range(n_chunks):
                tt = chunk_tt(c)
                cmin = jnp.min(tt, axis=0, keepdims=True)  # (1, r)
                onehot = ((tt == cmin) & (cmin < INF)).astype(jnp.float32)
                mat_c = mat_dot(onehot, c)
                better = cmin < best_t                      # (1, r)
                mat = jnp.where(better, mat_c, mat)
                best_t = jnp.minimum(best_t, cmin)
            return best_t, mat

        # Culled sweep (the AABB pre-reject): before each chunk's MT
        # matmul, a VPU slab test asks whether ANY live lane's ray can
        # (a) enter the chunk's bounding box at all and (b) do so closer
        # than its current best hit.  If not, @pl.when skips the chunk's
        # matmul + material fetch entirely.  The test is CONSERVATIVE
        # (false positives only sweep a chunk needlessly; zero-d axes are
        # clamped to a tiny direction so no NaN can cull a real hit), so
        # the image is BITWISE identical to the uncull sweep
        # (tests/test_megakernel.py).  On open OBJ scenes ~all samples
        # miss everything (SCENE_BENCH bunny avg path 1.004), so most
        # (tile-iteration x chunk) pairs skip — the brute-force sweep's
        # answer to BVH traversal without a data-dependent tree walk.
        actv = ac_ref[:, :] > 0
        tiny = jnp.float32(1e-30)
        sdx = jnp.where(jnp.abs(dx) < tiny, tiny, dx)
        sdy = jnp.where(jnp.abs(dy) < tiny, tiny, dy)
        sdz = jnp.where(jnp.abs(dz) < tiny, tiny, dz)
        ivx, ivy, ivz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz
        bt_ref[:, :] = jnp.full((1, r), INF, jnp.float32)
        mat_ref[:, :] = jnp.zeros((16, r), jnp.float32)

        def could_hit(c):
            lox, loy, loz = aabb_ref[c, 0], aabb_ref[c, 1], aabb_ref[c, 2]
            hix, hiy, hiz = aabb_ref[c, 3], aabb_ref[c, 4], aabb_ref[c, 5]
            t1x, t2x = (lox - ox) * ivx, (hix - ox) * ivx
            t1y, t2y = (loy - oy) * ivy, (hiy - oy) * ivy
            t1z, t2z = (loz - oz) * ivz, (hiz - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                          jnp.maximum(t1y, t2y)),
                              jnp.maximum(t1z, t2z))
            return (actv & (far >= jnp.maximum(near, 0.0))
                    & (near < bt_ref[:, :]))

        # Each scalar condition costs a vector->scalar reduction + a
        # Mosaic branch (measured ~several us — the same sync the while
        # condition's `unroll` amortises), so chunks are culled in GROUPS
        # of `cull_group`: one branch covers 4 chunks, and the Morton
        # surface sort keeps neighbouring chunks spatially adjacent so a
        # group's union test loses little selectivity.
        for c0 in range(0, n_chunks, cull_group):
            grp = range(c0, min(c0 + cull_group, n_chunks))
            could = could_hit(grp[0])
            for c in list(grp)[1:]:
                could = could | could_hit(c)
            any_could = jnp.sum(could.astype(jnp.int32)) > 0

            @pl.when(any_could)
            def _sweep(grp=grp):
                for c in grp:
                    tt = chunk_tt(c)
                    cmin = jnp.min(tt, axis=0, keepdims=True)
                    onehot = ((tt == cmin)
                              & (cmin < INF)).astype(jnp.float32)
                    mat_c = mat_dot(onehot, c)
                    better = cmin < bt_ref[:, :]
                    mat_ref[:, :] = jnp.where(better, mat_c, mat_ref[:, :])
                    bt_ref[:, :] = jnp.minimum(bt_ref[:, :], cmin)

        return bt_ref[:, :], mat_ref[:, :]

    # ---- initial state: every slot starts its k=0 pixel's first sample --
    # Ray state lives in per-variable (1, r) VMEM scratch refs, not
    # while_loop carries: carried vector values inherit sublane-offset
    # layouts that Mosaic cannot legalize in scf.yield, and row slices of
    # one packed (16, r) ref sit at sublane offsets 1..7 which force a
    # relayout copy on every load/store — offset-0 single-row refs are the
    # fast path (measured ~1.7x whole-kernel).
    it0 = jnp.int32(0)
    in_image0 = slot < n_pix
    dx0, dy0, dz0 = primary(slot, _uniform(seed, slot, it0, 2),
                            _uniform(seed, slot, it0, 3))
    ox_ref[:, :] = jnp.full((1, r), cpx)
    oy_ref[:, :] = jnp.full((1, r), cpy)
    oz_ref[:, :] = jnp.full((1, r), cpz)
    dx_ref[:, :] = dx0
    dy_ref[:, :] = dy0
    dz_ref[:, :] = dz0
    tr_ref[:, :] = one                                   # throughput
    tg_ref[:, :] = one
    tb_ref[:, :] = one
    ps_ref[:, :] = zero                                  # path_sum
    bn_ref[:, :] = jnp.zeros((1, r), jnp.int32)          # bounce
    rm_ref[:, :] = jnp.where(in_image0, spp - 1, 0).astype(jnp.int32)
    ac_ref[:, :] = in_image0.astype(jnp.int32)           # active
    px_ref[:, :] = slot                                  # current pixel
    km_ref[:, :] = jnp.zeros((1, r), jnp.int32)          # k (mux index)
    sa_ref[:, :] = jnp.zeros_like(sa_ref)                # per-k radiance

    def cond(carry):
        return carry[1] > 0

    def step(it):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        tr, tg, tb = tr_ref[:, :], tg_ref[:, :], tb_ref[:, :]
        path_sum = ps_ref[:, :]
        bounce = bn_ref[:, :]
        remaining = rm_ref[:, :]
        act = ac_ref[:, :] > 0
        pix = px_ref[:, :]
        kmx = km_ref[:, :]

        it1 = it + 1
        u1 = _uniform(seed, pix, it1, 0)
        u2 = _uniform(seed, pix, it1, 1)
        u3 = _uniform(seed, pix, it1, 2)
        u4 = _uniform(seed, pix, it1, 3)

        best_t, mat = intersect(ox, oy, oz, dx, dy, dz)
        nx, ny, nz = mat[0:1], mat[1:2], mat[2:3]
        cr, cg, cb = mat[3:4], mat[4:5], mat[5:6]
        er, eg, eb = mat[6:7], mat[7:8], mat[8:9]
        is_light = mat[9:10] > 0.5

        missed = act & (best_t >= INF)
        hit = act & ~missed
        hit_light = hit & is_light
        hit_surface = hit & ~is_light

        # terminal contribution, scattered to the slot's CURRENT pixel row
        # of the (3K, r) accumulator via a one-hot madd (no per-lane stores)
        envf = jnp.where(missed, jnp.float32(env), 0.0)
        lf = hit_light.astype(jnp.float32)
        crr = tr * (envf + er * lf)
        crg = tg * (envf + eg * lf)
        crb = tb * (envf + eb * lf)
        k_rows = jax.lax.broadcasted_iota(jnp.int32, (k_mux, r), 0)
        ksel = (k_rows == kmx).astype(jnp.float32)        # (K, r)
        sa_ref[0:k_mux, :] += ksel * crr
        sa_ref[k_mux:2 * k_mux, :] += ksel * crg
        sa_ref[2 * k_mux:3 * k_mux, :] += ksel * crb

        exhausted = hit_surface & (bounce + 1 >= max_bounces)
        survive = hit_surface & ~exhausted

        sdx, sdy, sdz, cost = sample_hemi(u1, u2, nx, ny, nz)
        # throughput *= (diffuse/pi) * cos / RHO ; RHO = 1/(2 pi) => *2*cos
        scale = jnp.float32(2.0) * cost
        tr = jnp.where(survive, tr * cr * scale, tr)
        tg = jnp.where(survive, tg * cg * scale, tg)
        tb = jnp.where(survive, tb * cb * scale, tb)

        rr_killed = jnp.zeros_like(survive)
        if russian_roulette:
            # Same unbiased kill/reweight as the wavefront integrators:
            # from rr_start_bounce on, survive with p = clip(max tp,
            # rr_min_prob, 1) and divide the throughput by p.  The draw
            # uses its own RNG stream (4) so RR-off images are untouched.
            u5 = _uniform(seed, pix, it1, 4)
            tmax = jnp.maximum(tr, jnp.maximum(tg, tb))
            p = jnp.clip(tmax, jnp.float32(rr_min_prob), jnp.float32(1.0))
            do_rr = survive & (bounce + 1 >= rr_start_bounce)
            rr_killed = do_rr & (u5 >= p)
            keep = (do_rr & ~rr_killed).astype(jnp.float32)
            inv_p = keep / p + (1.0 - keep)
            tr = tr * inv_p
            tg = tg * inv_p
            tb = tb * inv_p
            survive = survive & ~rr_killed

        hx = ox + best_t * dx
        hy = oy + best_t * dy
        hz = oz + best_t * dz
        ox = jnp.where(survive, hx + eps * sdx, ox)
        oy = jnp.where(survive, hy + eps * sdy, oy)
        oz = jnp.where(survive, hz + eps * sdz, oz)
        dx = jnp.where(survive, sdx, dx)
        dy = jnp.where(survive, sdy, dy)
        dz = jnp.where(survive, sdz, dz)

        done = missed | hit_light | rr_killed
        path_sum = (path_sum
                    + jnp.where(done, (bounce + 1).astype(jnp.float32), 0.0)
                    + jnp.where(exhausted, jnp.float32(max_bounces), 0.0))
        bounce = jnp.where(survive, bounce + 1, bounce)

        # regeneration: next sample of the current pixel, else the slot's
        # next multiplexed pixel (k+1), else go inactive
        freed = act & ~survive
        next_pix = pix + n_slots
        step_k = (freed & (remaining <= 0) & (kmx + 1 < k_mux)
                  & (next_pix < n_pix))
        pix = jnp.where(step_k, next_pix, pix)
        kmx = jnp.where(step_k, kmx + 1, kmx)
        remaining = jnp.where(step_k, spp, remaining)
        regen = freed & (remaining > 0)
        pdx, pdy, pdz = primary(pix, u3, u4)
        ox = jnp.where(regen, cpx, ox)
        oy = jnp.where(regen, cpy, oy)
        oz = jnp.where(regen, cpz, oz)
        dx = jnp.where(regen, pdx, dx)
        dy = jnp.where(regen, pdy, dy)
        dz = jnp.where(regen, pdz, dz)
        tr = jnp.where(regen, 1.0, tr)
        tg = jnp.where(regen, 1.0, tg)
        tb = jnp.where(regen, 1.0, tb)
        bounce = jnp.where(regen, 0, bounce)
        remaining = jnp.where(regen, remaining - 1, remaining)
        act = survive | regen

        ox_ref[:, :] = ox
        oy_ref[:, :] = oy
        oz_ref[:, :] = oz
        dx_ref[:, :] = dx
        dy_ref[:, :] = dy
        dz_ref[:, :] = dz
        tr_ref[:, :] = tr
        tg_ref[:, :] = tg
        tb_ref[:, :] = tb
        ps_ref[:, :] = path_sum
        bn_ref[:, :] = bounce
        rm_ref[:, :] = remaining
        ac_ref[:, :] = act.astype(jnp.int32)
        px_ref[:, :] = pix
        km_ref[:, :] = kmx
        return it1, act

    def body(carry):
        # `unroll`x unrolled: the while condition forces a vector->scalar
        # reduction + SMEM sync per trip; amortise it over several bounces
        # (the extra steps after global drain are idle-lane work only).
        it = carry[0]
        act = None
        for _ in range(unroll):
            it, act = step(it)
        return (it, jnp.sum(act.astype(jnp.int32)))

    final = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.sum(in_image0.astype(jnp.int32))))
    it = final[0]

    out_ref[0:3 * k_mux, :] = sa_ref[0:3 * k_mux, :]
    out_ref[3 * k_mux:3 * k_mux + 1, :] = ps_ref[:, :]
    out_ref[3 * k_mux + 1:3 * k_mux + 2, :] = jnp.broadcast_to(
        it.astype(jnp.float32)[None, None], (1, r))
    pad_rows = out_ref.shape[0] - (3 * k_mux + 2)
    if pad_rows > 0:
        out_ref[3 * k_mux + 2:, :] = jnp.zeros((pad_rows, r), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "r_tile", "pix_mux", "interpret",
                                    "precision", "unroll", "cull",
                                    "cull_group"))
def render_default_mega(key, scene: Scene, camera: Camera, cfg: RenderConfig,
                        r_tile: int = R_TILE, pix_mux: int = 8,
                        interpret: bool = False,
                        precision: str = "high3", unroll: int = 2,
                        cull: bool | None = None, cull_group: int = 1):
    """Render a frame with the megakernel; returns (image (H,W,3), aux).

    Same estimator as integrators.default_tracer.render_default
    (ref: default_path_tracing.cu:36-88); one pallas_call per frame.

    pix_mux = K: each ray slot serially owns K pixels (ids slot + k*n_slots)
    and regenerates into its next pixel when a sample dies — this amortises
    the long-path tail (a tile runs until its SLOWEST slot drains, and with
    K pixels per slot the per-slot workload variance shrinks ~K-fold).

    cull: AABB pre-reject for multi-chunk scenes (default: on whenever the
    scene spans more than one triangle chunk; bitwise-identical images —
    the slab test is conservative).  Forced off for single-chunk scenes.
    """
    if unroll < 1:
        raise ValueError(f"unroll must be >= 1, got {unroll}")
    if precision not in _PRECISIONS:
        raise ValueError(f"precision must be one of {sorted(_PRECISIONS)}, "
                         f"got {precision!r}")
    n_pix = cfg.n_pixels
    g, mtbl = mt_tables(scene)
    t_pad = g.shape[0] // 4
    t_chunk = min(t_pad, T_CHUNK)
    n_chunks = t_pad // t_chunk
    if cull is None:
        cull = n_chunks > 1
    cull = bool(cull) and n_chunks > 1

    compensated = precision == "high3"
    if compensated:
        # Fused compensated operands: [Gh | Gh | Gl] (4T, 48) so that
        # [Gh|Gh|Gl] @ [fh;fl;fh] yields Gh fh + Gh fl + Gl fh in one MXU
        # pass, and hi-over-lo material rows (32, T) for one M=32 fetch.
        g_hi, g_lo = _split_bf16(g)
        g = jnp.concatenate([g_hi, g_hi, g_lo], axis=1)       # (4T, 48)
        m_hi, m_lo = _split_bf16(mtbl)
        mtbl = jnp.concatenate([m_hi, m_lo], axis=0)          # (32, T)

    n_slots = int(math.ceil(n_pix / pix_mux / r_tile) * r_tile)
    n_tiles = n_slots // r_tile
    out_rows = int(math.ceil((3 * pix_mux + 2) / 8) * 8)

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    cam = jnp.stack([
        camera.position[0], camera.position[1], camera.position[2],
        jnp.cos(camera.yaw_y), jnp.sin(camera.yaw_y),
        jnp.cos(camera.yaw_x), jnp.sin(camera.yaw_x),
        jnp.float32(0.0),
    ]).reshape(1, 8).astype(jnp.float32)

    kernel = functools.partial(
        _mega_kernel, t_pad=t_pad, n_chunks=n_chunks, t_chunk=t_chunk,
        r_tile=r_tile, width=cfg.width, height=cfg.height, focal=cfg.focal,
        n_pix=n_pix, spp=cfg.samples_per_pixel,
        max_bounces=cfg.max_ray_bounces, env=cfg.environment_light,
        eps=cfg.eps, pix_mux=pix_mux, n_slots=n_slots,
        precision=_PRECISIONS[precision], unroll=unroll,
        compensated=compensated,
        russian_roulette=cfg.russian_roulette,
        rr_start_bounce=cfg.rr_start_bounce, rr_min_prob=cfg.rr_min_prob,
        cull=cull, cull_group=cull_group)

    n_pf = 2 if cull else 1          # (seed[, aabb]) scalar-prefetch args
    scratch = ([pltpu.VMEM((1, r_tile), jnp.float32) for _ in range(10)]
               + [pltpu.VMEM((1, r_tile), jnp.int32) for _ in range(5)]
               + [pltpu.VMEM((3 * pix_mux, r_tile), jnp.float32)])
    if cull:
        scratch += [pltpu.VMEM((1, r_tile), jnp.float32),
                    pltpu.VMEM((16, r_tile), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pf,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, *s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i, *s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mtbl.shape, lambda i, *s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, r_tile), lambda i, *s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    operands = (seed,)
    if cull:
        operands = (seed, chunk_aabbs(scene, t_pad, t_chunk))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, n_slots), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_pix) * cfg.samples_per_pixel * 10 * (
                t_pad * 140 + 300),
            transcendentals=int(n_pix) * cfg.samples_per_pixel * 10 * 4,
            bytes_accessed=(out_rows * n_slots + 65 * t_pad) * 4),
    )(*operands, cam, g, mtbl)

    k = pix_mux
    # pixel p = slot + k*n_slots lives at out[c*k + p//n_slots, p%n_slots]
    rad = jnp.stack([out[c * k:(c + 1) * k, :].reshape(-1)[:n_pix]
                     for c in range(3)], axis=1)
    img = (rad / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
    total = n_pix * cfg.samples_per_pixel
    aux = {"avg_path_length": jnp.sum(out[3 * k, :]) / total,
           "wavefront_iterations": jnp.max(out[3 * k + 1, :]).astype(
               jnp.int32)}
    return img, aux
