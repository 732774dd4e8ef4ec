"""Pallas TPU closest-hit kernel.

The measured hot loop (SURVEY §3.1: Ray::closest_intersection, ray.cu:17-36)
as a fused VMEM-resident kernel: for each tile of rays, Moller-Trumbore is
evaluated against triangle chunks entirely in VMEM with a running
min/argmin — the (rays, triangles) intermediate never touches HBM (the
XLA fallback in ops/intersect.py materialises it).

Layout (TPU tiling: lanes = rays, sublanes = triangles):

* rays packed (8, R_pad) float32 — rows 0-2 origin xyz, 3-5 direction xyz,
  rows 6-7 padding (sublane alignment);
* triangles packed (T_pad, 16) float32 — cols 0-2 v0, 3-5 e1 (v1-v0),
  6-8 e2 (v2-v0); padding triangles are degenerate (det == 0 -> never hit);
* outputs (8, R_pad) — row 0 broadcast over sublanes for (8, 128) block\n  alignment: best t (inf for miss) and best triangle index.

An `active_count` scalar is prefetched (PrefetchScalarGridSpec): ray tiles
whose start lies past the count skip the whole triangle sweep — combined
with the integrator's compaction this removes the dead-ray tail that
dominates long bounce loops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlrpt_tpu.scene.scene import Scene

INF = 3.0e38  # plain float: jnp constants would be captured consts in the kernel
R_TILE = 512        # rays per grid step (lanes, multiple of 128)
T_CHUNK_MAX = 256   # max triangles per inner step (sublanes, multiple of 8)


def _t_chunk(n_tris: int) -> int:
    """Sublane chunk: small scenes use one right-sized chunk instead of
    padding up to T_CHUNK_MAX (a 6.7x waste for the 38-triangle Cornell)."""
    t8 = max(8, int(math.ceil(n_tris / 8) * 8))
    return min(T_CHUNK_MAX, t8)


def _hit_kernel(count_ref, rays_ref, tris_ref, t_ref, idx_ref, *,
                n_chunks: int, t_chunk: int, r_tile: int):
    tile = pl.program_id(0)

    @pl.when(tile * r_tile < count_ref[0])
    def _():
        ox = rays_ref[0, :][None, :]
        oy = rays_ref[1, :][None, :]
        oz = rays_ref[2, :][None, :]
        dx = rays_ref[3, :][None, :]
        dy = rays_ref[4, :][None, :]
        dz = rays_ref[5, :][None, :]

        best_t = jnp.full((1, r_tile), INF, jnp.float32)
        best_i = jnp.zeros((1, r_tile), jnp.int32)

        for c in range(n_chunks):
            s = c * t_chunk
            v0x = tris_ref[pl.ds(s, t_chunk), 0][:, None]
            v0y = tris_ref[pl.ds(s, t_chunk), 1][:, None]
            v0z = tris_ref[pl.ds(s, t_chunk), 2][:, None]
            e1x = tris_ref[pl.ds(s, t_chunk), 3][:, None]
            e1y = tris_ref[pl.ds(s, t_chunk), 4][:, None]
            e1z = tris_ref[pl.ds(s, t_chunk), 5][:, None]
            e2x = tris_ref[pl.ds(s, t_chunk), 6][:, None]
            e2y = tris_ref[pl.ds(s, t_chunk), 7][:, None]
            e2z = tris_ref[pl.ds(s, t_chunk), 8][:, None]

            # Moller-Trumbore on the (T_CHUNK, R_TILE) block.
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(det == 0.0, 0.0, 1.0 / det)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

            valid = ((det != 0.0) & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t > 0.0))
            t = jnp.where(valid, t, INF)

            # Running min + first-minimum index (ties resolve to the lowest
            # triangle index, matching the XLA argmin / reference scan order).
            cmin = jnp.min(t, axis=0, keepdims=True)                 # (1, R)
            tri_ids = jax.lax.broadcasted_iota(jnp.int32,
                                               (t_chunk, r_tile), 0)
            hit_ids = jnp.where(t == cmin, tri_ids, t_chunk)
            cidx = jnp.min(hit_ids, axis=0, keepdims=True) + s
            take = cmin < best_t
            best_i = jnp.where(take, cidx, best_i)
            best_t = jnp.where(take, cmin, best_t)

        t_ref[:, :] = jnp.broadcast_to(best_t, (8, r_tile))
        idx_ref[:, :] = jnp.broadcast_to(best_i, (8, r_tile))

    @pl.when(tile * r_tile >= count_ref[0])
    def _():
        t_ref[:, :] = jnp.full((8, r_tile), INF, jnp.float32)
        idx_ref[:, :] = jnp.zeros((8, r_tile), jnp.int32)


def _hit_kernel_mxu(count_ref, rays_ref, g_ref, t_ref, idx_ref, *,
                    n_chunks: int, t_chunk: int, t_pad: int, r_tile: int):
    """MXU closest hit: the megakernel's matmul formulation (ops.megakernel
    module docstring) as a standalone t/index kernel.

    Each Moller-Trumbore determinant is linear in the 16 ray features
    f = [o, d, o (x) d, 1], so a triangle chunk's whole sweep is ONE
    compensated-bf16 matmul [Gh|Gh|Gl] @ [fh;fl;fh] (K=48 zero-pads to the
    MXU's 128 contraction lanes like K=16 would; ~1.5e-5 relative error)
    followed by a short VPU epilogue — vs ~35 full (T, R) VPU ops for the
    elementwise Cramer kernel above (measured 7x slower per segment than
    the megakernel's sweep at the bench shape).
    """
    tile = pl.program_id(0)

    @pl.when(tile * r_tile < count_ref[0])
    def _():
        ox = rays_ref[0, :][None, :]
        oy = rays_ref[1, :][None, :]
        oz = rays_ref[2, :][None, :]
        dx = rays_ref[3, :][None, :]
        dy = rays_ref[4, :][None, :]
        dz = rays_ref[5, :][None, :]
        one = jnp.ones((1, r_tile), jnp.float32)

        f = jnp.concatenate([
            ox, oy, oz, dx, dy, dz,
            ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            one,
        ], axis=0)                                        # (16, r)
        f_hi = f.astype(jnp.bfloat16)
        f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f48 = jnp.concatenate([f_hi, f_lo, f_hi], axis=0)  # (48, r)

        best_t = jnp.full((1, r_tile), INF, jnp.float32)
        best_i = jnp.zeros((1, r_tile), jnp.int32)
        for c in range(n_chunks):
            q = jax.lax.dot_general(
                g_ref[pl.ds(4 * c * t_chunk, 4 * t_chunk), :], f48,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (4*t_chunk, r)
            det = q[0 * t_chunk:1 * t_chunk]
            up = q[1 * t_chunk:2 * t_chunk]
            vp = q[2 * t_chunk:3 * t_chunk]
            tq = q[3 * t_chunk:4 * t_chunk]
            # Sign tests multiplied through by det (det == 0 is subsumed:
            # tq*det == 0 fails > 0); division discarded by the where.
            a = up * det
            b = vp * det
            valid = ((a >= 0.0) & (b >= 0.0) & (a + b <= det * det)
                     & (tq * det > 0.0))
            tt = jnp.where(valid, tq / det, INF)          # (t_chunk, r)

            cmin = jnp.min(tt, axis=0, keepdims=True)
            tri_ids = jax.lax.broadcasted_iota(jnp.int32,
                                               (t_chunk, r_tile), 0)
            hit_ids = jnp.where(tt == cmin, tri_ids, t_pad)
            cidx = jnp.min(hit_ids, axis=0, keepdims=True) + c * t_chunk
            take = cmin < best_t                 # strict: lowest chunk wins
            best_i = jnp.where(take, cidx, best_i)
            best_t = jnp.where(take, cmin, best_t)

        t_ref[:, :] = jnp.broadcast_to(best_t, (8, r_tile))
        idx_ref[:, :] = jnp.broadcast_to(best_i, (8, r_tile))

    @pl.when(tile * r_tile >= count_ref[0])
    def _():
        t_ref[:, :] = jnp.full((8, r_tile), INF, jnp.float32)
        idx_ref[:, :] = jnp.zeros((8, r_tile), jnp.int32)


def pack_triangles(scene: Scene) -> jnp.ndarray:
    """Scene triangles -> (T_pad, 16) kernel layout (traceable; pad
    triangles are degenerate so det == 0 and they never hit)."""
    v0 = jnp.asarray(scene.v0, jnp.float32)
    e1 = jnp.asarray(scene.v1, jnp.float32) - v0
    e2 = jnp.asarray(scene.v2, jnp.float32) - v0
    t = v0.shape[0]
    chunk = _t_chunk(t)
    t_pad = int(math.ceil(t / chunk) * chunk)
    packed = jnp.concatenate(
        [v0, e1, e2, jnp.zeros((t, 7), jnp.float32)], axis=1)   # (T, 16)
    return jnp.pad(packed, ((0, t_pad - t), (0, 0)))


def _hit_mat_kernel_mxu(count_ref, rays_ref, g_ref, m2_ref, t_ref, idx_ref,
                        mat_ref, *, n_chunks: int, t_chunk: int, t_pad: int,
                        r_tile: int):
    """_hit_kernel_mxu + per-ray material row via a one-hot matmul.

    On TPU every dynamic gather costs ~4-6 ms per 518400 queries
    REGARDLESS of row size (latency-bound), so the integrators' four
    small-table gathers (normal/diffuse/emission/luminance[tri]) plus the
    class lookup cost more than the whole hit sweep.  Emitting the packed
    material row from inside the kernel (the one-hot is already implied
    by the argmin) replaces them all with one extra M=32 MXU pass.
    """
    tile = pl.program_id(0)

    @pl.when(tile * r_tile < count_ref[0])
    def _():
        ox = rays_ref[0, :][None, :]
        oy = rays_ref[1, :][None, :]
        oz = rays_ref[2, :][None, :]
        dx = rays_ref[3, :][None, :]
        dy = rays_ref[4, :][None, :]
        dz = rays_ref[5, :][None, :]
        one = jnp.ones((1, r_tile), jnp.float32)

        f = jnp.concatenate([
            ox, oy, oz, dx, dy, dz,
            ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            one,
        ], axis=0)
        f_hi = f.astype(jnp.bfloat16)
        f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f48 = jnp.concatenate([f_hi, f_lo, f_hi], axis=0)

        best_t = jnp.full((1, r_tile), INF, jnp.float32)
        best_i = jnp.zeros((1, r_tile), jnp.int32)
        mat = jnp.zeros((16, r_tile), jnp.float32)
        for c in range(n_chunks):
            q = jax.lax.dot_general(
                g_ref[pl.ds(4 * c * t_chunk, 4 * t_chunk), :], f48,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            det = q[0 * t_chunk:1 * t_chunk]
            up = q[1 * t_chunk:2 * t_chunk]
            vp = q[2 * t_chunk:3 * t_chunk]
            tq = q[3 * t_chunk:4 * t_chunk]
            a = up * det
            b = vp * det
            valid = ((a >= 0.0) & (b >= 0.0) & (a + b <= det * det)
                     & (tq * det > 0.0))
            tt = jnp.where(valid, tq / det, INF)

            cmin = jnp.min(tt, axis=0, keepdims=True)
            tri_ids = jax.lax.broadcasted_iota(jnp.int32,
                                               (t_chunk, r_tile), 0)
            hit_ids = jnp.where(tt == cmin, tri_ids, t_pad)
            cidx = jnp.min(hit_ids, axis=0, keepdims=True) + c * t_chunk
            take = cmin < best_t
            # Material fetch: one-hot against the chunk min (exact-tie
            # double-count is measure-zero, see ops.megakernel), hi/lo
            # bf16 rows recover f32 (and integer class ids < 2^16) exactly.
            onehot = ((tt == cmin) & (cmin < INF)).astype(jnp.bfloat16)
            m2 = jax.lax.dot_general(
                m2_ref[:, pl.ds(c * t_chunk, t_chunk)], onehot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (32, r)
            mat_c = m2[:16] + m2[16:]
            mat = jnp.where(take, mat_c, mat)
            best_i = jnp.where(take, cidx, best_i)
            best_t = jnp.where(take, cmin, best_t)

        t_ref[:, :] = jnp.broadcast_to(best_t, (8, r_tile))
        idx_ref[:, :] = jnp.broadcast_to(best_i, (8, r_tile))
        mat_ref[:, :] = mat

    @pl.when(tile * r_tile >= count_ref[0])
    def _():
        t_ref[:, :] = jnp.full((8, r_tile), INF, jnp.float32)
        idx_ref[:, :] = jnp.zeros((8, r_tile), jnp.int32)
        mat_ref[:, :] = jnp.zeros((16, r_tile), jnp.float32)


def pack_scene_mxu(scene: Scene, tri_class: jnp.ndarray | None = None):
    """Scene -> (g48 (4*T_pad, 48) bf16, m2 (32, T_pad) bf16) for
    closest_hit_mat_mxu.

    m2 stacks the hi-over-lo bf16 split of the megakernel material table
    (rows: 0-2 normal, 3-5 diffuse_c, 6-8 emission, 9 is_light,
    10 luminance); row 11 carries `tri_class` (integer normal-class ids,
    exact through the compensated split for ids < 2^16) when given.
    """
    from rlrpt_tpu.ops.megakernel import _split_bf16, mt_tables
    g, mtbl = mt_tables(scene)
    if tri_class is not None:
        t = tri_class.shape[0]
        # Class ids ride the compensated bf16 hi/lo split, which is exact
        # only below 2^16 (one class per distinct normal — a mesh with
        # more would silently round to wrong ids; ADVICE r3).  Checked
        # only when concrete: under jit the ids arrive as a tracer, and
        # build_volume_class_table checked them at build time.
        if not isinstance(tri_class, jax.core.Tracer):
            n_cls = int(jnp.max(tri_class)) + 1 if t else 0
            if n_cls >= 1 << 16:
                raise ValueError(
                    f"{n_cls} normal classes exceed the 2^16 ids the bf16 "
                    "hi/lo material row can carry exactly; use the f32 hit "
                    "path (hit_mode='f32') for this scene")
        mtbl = mtbl.at[11, :t].set(jnp.asarray(tri_class, jnp.float32))
    g_hi, g_lo = _split_bf16(g)
    m_hi, m_lo = _split_bf16(mtbl)
    return (jnp.concatenate([g_hi, g_hi, g_lo], axis=1),
            jnp.concatenate([m_hi, m_lo], axis=0))


@functools.partial(jax.jit, static_argnames=("interpret", "r_tile"))
def closest_hit_mat_mxu(o: jnp.ndarray, d: jnp.ndarray, g48: jnp.ndarray,
                        m2: jnp.ndarray, active_count: jnp.ndarray,
                        interpret: bool = False, r_tile: int = R_TILE):
    """Closest hit + material row via the MXU sweep (see
    _hit_mat_kernel_mxu / pack_scene_mxu).

    Returns (t (R,), tri_idx (R,) int32, mat (R, 16) f32).
    """
    from rlrpt_tpu.ops.megakernel import T_CHUNK

    r = o.shape[0]
    r_pad = int(math.ceil(r / r_tile) * r_tile)
    rays = jnp.zeros((8, r_pad), jnp.float32)
    rays = rays.at[0:3, :r].set(o.T)
    rays = rays.at[3:6, :r].set(d.T)

    n_tiles = r_pad // r_tile
    t_pad = g48.shape[0] // 4
    t_chunk = min(t_pad, T_CHUNK)
    n_chunks = t_pad // t_chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g48.shape, lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m2.shape, lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    t, idx, mat = pl.pallas_call(
        functools.partial(_hit_mat_kernel_mxu, n_chunks=n_chunks,
                          t_chunk=t_chunk, t_pad=t_pad, r_tile=r_tile),
        out_shape=[
            jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((16, r_pad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 48 * r_pad * 4 * t_pad + 2 * 32 * r_pad * t_pad,
            transcendentals=0,
            bytes_accessed=(24 * r_pad + 128 * t_pad) * 4),
    )(jnp.asarray(active_count, jnp.int32).reshape(1), rays, g48, m2)
    return t[0, :r], idx[0, :r], mat[:, :r].T


def pack_triangles_mxu(scene: Scene) -> jnp.ndarray:
    """Scene triangles -> fused compensated-bf16 MT coefficient table
    [Gh | Gh | Gl] (4*T_pad, 48) for closest_hit_packed_mxu (row-group
    layout from ops.megakernel.mt_tables: chunk c = rows
    [4*c*t_chunk, 4*(c+1)*t_chunk) as [det | u' | v' | t'])."""
    from rlrpt_tpu.ops.megakernel import _split_bf16, mt_tables
    g, _ = mt_tables(scene)
    g_hi, g_lo = _split_bf16(g)
    return jnp.concatenate([g_hi, g_hi, g_lo], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "r_tile"))
def closest_hit_packed_mxu(o: jnp.ndarray, d: jnp.ndarray, g48: jnp.ndarray,
                           active_count: jnp.ndarray,
                           interpret: bool = False, r_tile: int = R_TILE):
    """Closest hit via the MXU matmul sweep (see _hit_kernel_mxu).

    Same contract as closest_hit_packed but takes the pack_triangles_mxu
    table; intersection distances carry the compensated-bf16 error
    (~1.5e-5 relative — at the estimator's MC noise floor, see
    tools/precision_check.py).  Returns (t (R,), tri_idx (R,) int32).
    """
    from rlrpt_tpu.ops.megakernel import T_CHUNK

    r = o.shape[0]
    r_pad = int(math.ceil(r / r_tile) * r_tile)
    rays = jnp.zeros((8, r_pad), jnp.float32)
    rays = rays.at[0:3, :r].set(o.T)
    rays = rays.at[3:6, :r].set(d.T)

    n_tiles = r_pad // r_tile
    t_pad = g48.shape[0] // 4
    t_chunk = min(t_pad, T_CHUNK)
    n_chunks = t_pad // t_chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g48.shape, lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(_hit_kernel_mxu, n_chunks=n_chunks,
                          t_chunk=t_chunk, t_pad=t_pad, r_tile=r_tile),
        out_shape=[
            jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, r_pad), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 48 * r_pad * 4 * t_pad, transcendentals=0,
            bytes_accessed=(8 * r_pad + 96 * t_pad) * 4),
    )(jnp.asarray(active_count, jnp.int32).reshape(1), rays, g48)
    return t[0, :r], idx[0, :r]


@functools.partial(jax.jit, static_argnames=("interpret", "r_tile"))
def closest_hit_packed(o: jnp.ndarray, d: jnp.ndarray, tris: jnp.ndarray,
                       active_count: jnp.ndarray, interpret: bool = False,
                       r_tile: int = R_TILE):
    """Closest hit for rays (R, 3)/(R, 3) against packed triangles.

    active_count: int32 scalar — rays at index >= count are skipped (their
    outputs are INF/0).  R is padded to a multiple of R_TILE internally.
    Returns (t (R,), tri_idx (R,) int32).
    """
    r = o.shape[0]
    r_pad = int(math.ceil(r / r_tile) * r_tile)
    rays = jnp.zeros((8, r_pad), jnp.float32)
    rays = rays.at[0:3, :r].set(o.T)
    rays = rays.at[3:6, :r].set(d.T)

    n_tiles = r_pad // r_tile
    t_chunk = _t_chunk(tris.shape[0])
    n_chunks = tris.shape[0] // t_chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tris.shape[0], 16), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, r_tile), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(_hit_kernel, n_chunks=n_chunks, t_chunk=t_chunk,
                          r_tile=r_tile),
        out_shape=[
            jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, r_pad), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=55 * r_pad * tris.shape[0], transcendentals=0,
            bytes_accessed=(8 * r_pad + 16 * tris.shape[0]) * 4),
    )(jnp.asarray(active_count, jnp.int32).reshape(1), rays, tris)
    return t[0, :r], idx[0, :r]


def closest_hit_pallas(o: jnp.ndarray, d: jnp.ndarray, scene: Scene,
                       tris: jnp.ndarray | None = None,
                       active_count=None, interpret: bool = False,
                       r_tile: int = R_TILE):
    """Drop-in `ops.intersect.closest_hit` replacement backed by the VMEM
    kernel: returns the same Hit record (t/tri/hit_type/position/normal)
    so integrators can swap hit implementations without other changes
    (used by the deep paths, ref: neural_q_pathtracer.cu:646-752 and
    pre_trained_pathtracer.cu:413-491, which share the same
    closest_intersection as every other tracer, ray.cu:17-36).

    `tris`: optional pre-packed triangle table (pack_triangles(scene)) so
    per-bounce callers pack once per frame.
    """
    from rlrpt_tpu.ops.intersect import Hit
    from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE

    if tris is None:
        tris = pack_triangles(scene)
    if active_count is None:
        active_count = o.shape[0]
    t, tri = closest_hit_packed(o, d, tris, active_count,
                                interpret=interpret, r_tile=r_tile)
    missed = t >= jnp.float32(1.0e38)
    hit_type = jnp.where(
        missed, NOTHING,
        jnp.where(tri >= scene.n_surfaces, AREA_LIGHT,
                  SURFACE)).astype(jnp.int32)
    t_safe = jnp.where(missed, 0.0, t)
    position = o + t_safe[:, None] * d
    normal = scene.normal[tri]
    return Hit(t=jnp.where(missed, jnp.float32(INF), t), tri=tri,
               hit_type=hit_type, position=position, normal=normal)


def material_rows(scene: Scene, tri: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) material rows via per-field gathers — layout matches
    pack_scene_mxu's table (fallback for the XLA hit path; the MXU kernel
    emits the same rows without any gathers)."""
    n = tri.shape[0]
    return jnp.concatenate([
        scene.normal[tri], scene.diffuse_c[tri], scene.emission[tri],
        (tri >= scene.n_surfaces)[:, None].astype(jnp.float32),
        scene.luminance[tri][:, None],
        jnp.zeros((n, 5), jnp.float32),
    ], axis=1)


def closest_hit_pallas_mat(o: jnp.ndarray, d: jnp.ndarray, scene: Scene,
                           g48: jnp.ndarray, m2: jnp.ndarray,
                           active_count=None, interpret: bool = False,
                           r_tile: int = R_TILE):
    """closest_hit_pallas drop-in that ALSO returns the material row from
    the MXU kernel (no per-field gathers; see closest_hit_mat_mxu).

    Returns (Hit, mat (N, 16)).  Hit.normal comes from the material row
    (zeros for misses — consumers mask on hit_type, as with the t=0
    position convention below).
    """
    from rlrpt_tpu.ops.intersect import Hit
    from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE

    if active_count is None:
        active_count = o.shape[0]
    t, tri, mat = closest_hit_mat_mxu(o, d, g48, m2, active_count,
                                      interpret=interpret, r_tile=r_tile)
    missed = t >= jnp.float32(1.0e38)
    hit_type = jnp.where(
        missed, NOTHING,
        jnp.where(tri >= scene.n_surfaces, AREA_LIGHT,
                  SURFACE)).astype(jnp.int32)
    t_safe = jnp.where(missed, 0.0, t)
    position = o + t_safe[:, None] * d
    return Hit(t=jnp.where(missed, jnp.float32(INF), t), tri=tri,
               hit_type=hit_type, position=position,
               normal=mat[:, 0:3]), mat
