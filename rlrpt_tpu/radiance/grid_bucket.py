"""Grid-bucketed nearest-radiance-volume search (the fast path).

The reference prunes its KD walk to a fixed reach: both branches are only
explored while delta^2 < MAX_DIST = 0.003 (radiance_map.cu:184-196,
radiance_volumes_settings.h:15), i.e. candidates further than
sqrt(0.003) ~ 0.055 world units across a split plane are never visited, and
when nothing on the walked path passes the exact-normal filter it falls
back to volume 0 (radiance_map.cu:163-166).  The search is therefore
*bounded-reach approximate by design*.

The dense argmin in nn_search.py is exact but O(V) per query — at the
default volume density (V ~ 2.5e4 for cornell) it dominates the SARSA
frame.  This module trades that for the same bounded-reach semantics the
reference has, in a TPU-friendly shape:

* build (host, once per volume set): hash volumes into a uniform grid over
  the scene AABB; each cell stores the <= K candidates from its 3x3x3
  neighbourhood, nearest-to-cell-centre first, as a PAYLOAD table
  (C, K, 8) = [pos(3), normal(3), index, used-flag] so a query needs ONE
  gather;
* query (device): cell id per query point -> gather (N, K, 8) -> masked
  argmin over K with the exact-normal-match filter (VPU, O(K) per query).

Cell size defaults to the reference's pruning reach, so any candidate the
reference could have reached is in the neighbourhood (up to the K cap,
which replaces the reference's walk-order truncation).  Queries in empty
neighbourhoods return volume 0, exactly the reference's fallback.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.radiance.volumes import RadianceVolumes

#: The reference's KD-walk reach: branches beyond sqrt(MAX_DIST) are pruned
#: (radiance_map.cu:184-196, radiance_volumes_settings.h:15).
REFERENCE_REACH = math.sqrt(0.003)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VolumeGrid:
    """Uniform-grid candidate table for nearest-volume queries."""
    payload: jnp.ndarray    # (C, K, 8) f32: pos(3) normal(3) index used
    origin: jnp.ndarray     # (3,) f32 AABB lower corner
    inv_cell: jnp.ndarray   # scalar f32, 1 / cell_size
    dims: tuple = dataclasses.field(metadata=dict(static=True))  # (nx,ny,nz)
    k_max: int = dataclasses.field(metadata=dict(static=True))


def _median_nn_distance(pos: np.ndarray, sample: int = 512,
                        seed: int = 0) -> float:
    """Median nearest-neighbour spacing of the volume cloud (sampled)."""
    v = pos.shape[0]
    if v < 2:
        return 1.0
    rng = np.random.default_rng(seed)
    idx = rng.choice(v, size=min(sample, v), replace=False)
    d2 = np.sum((pos[idx, None, :] - pos[None, :, :]) ** 2, axis=-1)
    d2[np.arange(len(idx)), idx] = np.inf
    return float(np.median(np.sqrt(d2.min(axis=-1))))


def build_volume_grid(vols: RadianceVolumes, cell_size: float | None = None,
                      k_max: int = 64, margin: float = 1e-3) -> VolumeGrid:
    """Host-side (numpy) construction of the per-cell candidate table.

    cell_size defaults to max(REFERENCE_REACH, 3x the volume cloud's median
    nearest-neighbour spacing), so one 3x3x3 neighbourhood covers both the
    reference's pruning reach and — at any volume density — the distance to
    a typical true nearest neighbour.  Each cell keeps the k_max candidates
    nearest to its centre (the reference's counterpart is walk-order
    truncation of the pruned tree).
    """
    pos = np.asarray(vols.position, np.float32)
    nrm = np.asarray(vols.normal, np.float32)
    v = pos.shape[0]
    if cell_size is not None:
        cell = float(cell_size)
    else:
        cell = max(REFERENCE_REACH, 3.0 * _median_nn_distance(pos))

    lo = pos.min(axis=0) - margin
    hi = pos.max(axis=0) + margin
    dims = np.maximum(1, np.ceil((hi - lo) / cell).astype(np.int64))
    nx, ny, nz = (int(dims[0]), int(dims[1]), int(dims[2]))
    c = nx * ny * nz

    coord = np.clip(((pos - lo) / cell).astype(np.int64), 0, dims - 1)

    # Each volume is a candidate for its own cell and the 26 neighbours.
    offs = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                     for k in (-1, 0, 1)], np.int64)          # (27, 3)
    nco = coord[None, :, :] + offs[:, None, :]                # (27, V, 3)
    ok = np.all((nco >= 0) & (nco < dims), axis=-1)           # (27, V)
    cell_id = (nco[..., 0] * ny + nco[..., 1]) * nz + nco[..., 2]
    centre = lo + (nco.astype(np.float32) + 0.5) * cell       # (27, V, 3)
    d2 = np.sum((centre - pos[None, :, :]) ** 2, axis=-1)     # (27, V)

    cid = cell_id[ok]
    vid = np.broadcast_to(np.arange(v, dtype=np.int64), (27, v))[ok]
    dist = d2[ok]

    # Rank candidates within each cell by distance to the cell centre and
    # keep the first k_max (vectorised group-top-K via lexsort).
    order = np.lexsort((dist, cid))
    cid, vid = cid[order], vid[order]
    new_group = np.ones(len(cid), bool)
    new_group[1:] = cid[1:] != cid[:-1]
    starts = np.flatnonzero(new_group)
    group_start = np.repeat(starts, np.diff(np.append(starts, len(cid))))
    rank = np.arange(len(cid)) - group_start
    keep = rank < k_max
    cid, vid, rank = cid[keep], vid[keep], rank[keep]

    payload = np.zeros((c, k_max, 8), np.float32)
    payload[cid, rank, 0:3] = pos[vid]
    payload[cid, rank, 3:6] = nrm[vid]
    payload[cid, rank, 6] = vid.astype(np.float32)
    payload[cid, rank, 7] = 1.0

    return VolumeGrid(payload=jnp.asarray(payload),
                      origin=jnp.asarray(lo, jnp.float32),
                      inv_cell=jnp.float32(1.0 / cell),
                      dims=(nx, ny, nz), k_max=k_max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VolumeClassTable:
    """Precomputed nearest-volume answer table (the fastest search path).

    The bucketed search (VolumeGrid) still gathers a (K, 8) candidate row
    per query — 2 KB/ray, measured ~80% of the whole SARSA frame at the
    bench point.  This table precomputes the ANSWER instead: hit normals
    are always one of the scene's per-triangle normals (a small set of
    "normal classes"), so for a fine spatial cell the query result
    "nearest volume with exactly this normal" is one of <= n_slots
    class answers stored in the cell's row.  A query is then ONE 64-byte
    row gather + a per-triangle class lookup — no per-candidate distances.

    Semantics preserved from find_closest_volume_grid / the reference's
    bounded-reach KD walk (radiance_map.cu:150-203): nearest same-class
    volume within reach, else nearest any-class volume within reach, else
    volume 0 (the reference's fallback).  The approximation: answers are
    computed at CELL CENTRES, so the effective query position is
    quantised by half a cell (default cell = a quarter of the bucket
    grid's, i.e. ~the volume cloud's median spacing / 1.3) — a
    perturbation of the same order as the reference's own walk-order
    truncation, validated statistically in tests/test_grid_bucket.py.
    """
    table: jnp.ndarray      # (C, 16) int32 row: [cls0, ans0, ... cls3,
                            # ans3, fallback, has_any, pad...]; cls == -1
                            # marks an empty slot
    tri_class: jnp.ndarray  # (T,) int32 normal-class id per scene triangle
    origin: jnp.ndarray     # (3,) f32 AABB lower corner
    inv_cell: jnp.ndarray   # scalar f32
    dims: tuple = dataclasses.field(metadata=dict(static=True))
    n_slots: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nbytes(self) -> int:
        """Device bytes of the answer table (the dominant allocation)."""
        return int(self.table.size) * 4 + int(self.tri_class.size) * 4


#: Default device-memory budget for the answer table.  Scenes with large
#: extents would otherwise build extent^3-scaled tables unboundedly (the
#: reference's archway Q-table alone is 272 MB, thesis tab:memory_usage).
TABLE_MEM_BUDGET_BYTES = 256 << 20


def build_volume_class_table(vols: RadianceVolumes, scene,
                             cell_size: float | None = None,
                             n_slots: int = 4,
                             margin: float = 1e-3,
                             mem_budget_bytes: int | None =
                             TABLE_MEM_BUDGET_BYTES) -> VolumeClassTable:
    """Host-side (numpy + cKDTree) construction of the answer table.

    reach (how far a class answer may be from the cell) defaults to 1.5x
    the bucket grid's cell plus half this table's (possibly coarsened)
    cell diagonal — the VolumeGrid neighbourhood, itself modelled on the
    reference's KD pruning reach, widened so a budget-coarsened cell's
    centre can always reach volumes inside its own cell.

    The table is (cells, 16) int32 = 64 B/cell, and cells scale with the
    scene extent cubed; when the default cell size would exceed
    `mem_budget_bytes` the cell is coarsened (cube-root law) to fit —
    answer quantisation degrades gracefully toward the bucket search's
    own cell scale.  Pass mem_budget_bytes=None (or an explicit
    cell_size) to disable the cap.  The chosen size is queryable as
    `table.nbytes`.
    """
    from scipy.spatial import cKDTree

    # The fixed 16-wide row stores slot (cls, ans) pairs at columns
    # 0..2*n_slots-1 and the fallback/has_any answers at columns 8/9; more
    # than 4 slots would overwrite the fallback (ADVICE r3).
    if not 1 <= n_slots <= 4:
        raise ValueError(f"n_slots must be in [1, 4], got {n_slots}")

    pos = np.asarray(vols.position, np.float32)
    nrm = np.asarray(vols.normal, np.float32)
    tri_nrm = np.asarray(scene.normal, np.float32)

    coarse = max(REFERENCE_REACH, 3.0 * _median_nn_distance(pos))
    cell = float(cell_size) if cell_size is not None else coarse / 4.0

    extent = (pos.max(axis=0) + margin) - (pos.min(axis=0) - margin)

    def _cells_at(c: float) -> int:
        d = np.maximum(1, np.ceil(extent / c).astype(np.int64))
        return int(d[0] * d[1] * d[2])

    if cell_size is None and mem_budget_bytes is not None:
        row_bytes = 64                     # (16,) int32 per cell
        if _cells_at(cell) * row_bytes > mem_budget_bytes:
            # Cube-root jump to the budget, then nudge past ceil effects.
            cell *= (_cells_at(cell) * row_bytes / mem_budget_bytes) ** (1 / 3)
            while _cells_at(cell) * row_bytes > mem_budget_bytes:
                cell *= 1.05

    # Query reach must scale with the (possibly budget-coarsened) cell:
    # with the fixed 1.5*coarse reach, a cell coarsened past ~reach/0.87
    # puts every cell CENTRE farther than `reach` from all volumes, so the
    # distance-bounded k-NN queries below return nothing and every hit in
    # those cells silently resolves to fallback volume 0 (ADVICE r4).
    # 0.87*cell ~ half the cell diagonal guarantees a centre reaches any
    # volume inside its own cell.
    reach = 1.5 * coarse + 0.87 * cell

    # Normal classes over the union of triangle and volume normals
    # (volumes inherit their triangle's normal, so byte-exact grouping is
    # a pure integer id assignment).
    all_nrm = np.ascontiguousarray(
        np.concatenate([tri_nrm, nrm], axis=0))
    _, inv = np.unique(all_nrm.view([("", all_nrm.dtype)] * 3),
                       return_inverse=True)
    inv = inv.reshape(-1)
    # The MXU hit kernel carries class ids through a compensated bf16
    # hi/lo split, exact only below 2^16 (ADVICE r3; intersect_pallas.
    # pack_scene_mxu re-checks when concrete).
    n_classes = int(inv.max()) + 1 if len(inv) else 0
    if n_classes >= 1 << 16:
        raise ValueError(
            f"{n_classes} distinct normals exceed the 2^16 class ids the "
            "answer table supports; use the VolumeGrid search for this "
            "scene")
    tri_class = inv[:len(tri_nrm)].astype(np.int32)
    vol_class = inv[len(tri_nrm):].astype(np.int32)

    lo = pos.min(axis=0) - margin
    hi = pos.max(axis=0) + margin
    dims = np.maximum(1, np.ceil((hi - lo) / cell).astype(np.int64))
    nx, ny, nz = (int(dims[0]), int(dims[1]), int(dims[2]))
    c = nx * ny * nz

    gx, gy, gz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    centres = (lo + (np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + 0.5)
               * cell).astype(np.float32)                    # (C, 3)

    table = np.full((c, 16), -1, np.int32)
    table[:, 8] = 0                                          # fallback
    table[:, 9] = 0                                          # has_any

    # ONE k-NN query (not one per class — scenes like bunny have
    # thousands of single-triangle classes): per near-surface cell the 64
    # nearest volumes within reach, exactly the bucket search's
    # k_max-truncated candidate set evaluated at the cell centre; then
    # fill the class slots first-come (candidates arrive distance-sorted,
    # so each class's first occurrence IS its nearest volume).
    tree_all = cKDTree(pos)
    k_cand = min(64, len(pos))
    d1, _ = tree_all.query(centres, distance_upper_bound=reach)
    near = np.flatnonzero(np.isfinite(d1))
    if len(near):
        d, j = tree_all.query(centres[near], k=k_cand,
                              distance_upper_bound=reach)
        d = d.reshape(len(near), k_cand)
        j = j.reshape(len(near), k_cand)
        table[near, 8] = j[:, 0].astype(np.int32)            # nearest any
        table[near, 9] = 1

        slot_cls = np.full((len(near), n_slots), -1, np.int64)
        slot_ans = np.full((len(near), n_slots), 0, np.int32)
        n_free = np.zeros(len(near), np.int64)               # next free slot
        for k in range(k_cand):
            ok = np.isfinite(d[:, k])
            cl = np.where(ok, vol_class[np.where(ok, j[:, k], 0)], -2)
            already = (slot_cls == cl[:, None]).any(axis=1)
            ins = ok & ~already & (n_free < n_slots)
            rows = np.flatnonzero(ins)
            slot_cls[rows, n_free[rows]] = cl[rows]
            slot_ans[rows, n_free[rows]] = j[rows, k].astype(np.int32)
            n_free[rows] += 1
        table[near, 0:2 * n_slots:2] = slot_cls.astype(np.int32)
        table[near, 1:2 * n_slots:2] = slot_ans

    return VolumeClassTable(table=jnp.asarray(table),
                            tri_class=jnp.asarray(tri_class),
                            origin=jnp.asarray(lo, jnp.float32),
                            inv_cell=jnp.float32(1.0 / cell),
                            dims=(nx, ny, nz), n_slots=n_slots)


def find_closest_volume_table(tb: VolumeClassTable, qpos: jnp.ndarray,
                              tri: jnp.ndarray,
                              cls: jnp.ndarray | None = None) -> jnp.ndarray:
    """Nearest volume per query via the precomputed answer table.

    qpos (N, 3) hit positions, tri (N,) int32 hit-triangle ids (the hit
    normal IS the triangle's normal, so the class filter is an integer
    compare).  Pass `cls` (N,) int32 to skip the tri_class gather when
    the caller already has the class ids (e.g. from the MXU hit kernel's
    material row).  Returns (N,) int32 volume indices.
    """
    nx, ny, nz = tb.dims
    co = jnp.clip(((qpos - tb.origin) * tb.inv_cell).astype(jnp.int32),
                  0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    cell = (co[:, 0] * ny + co[:, 1]) * nz + co[:, 2]         # (N,)
    row = tb.table[cell]                                      # (N, 16)
    if cls is None:
        cls = tb.tri_class[tri]                               # (N,)
    ans = row[:, 8]                                           # fallback
    for s in range(tb.n_slots - 1, -1, -1):
        ans = jnp.where(row[:, 2 * s] == cls, row[:, 2 * s + 1], ans)
    return ans.astype(jnp.int32)


def find_closest_volume_grid(grid: VolumeGrid, qpos: jnp.ndarray,
                             qnorm: jnp.ndarray) -> jnp.ndarray:
    """Nearest volume (normal-filtered) per query via the bucket table.

    qpos, qnorm: (N, 3).  Returns (N,) int32 volume indices.  Same filter
    rules as nn_search.find_closest_volume: exact-normal matches win by
    distance; with no match among candidates the nearest candidate is
    returned; with no candidates at all, volume 0 (the reference's
    fallback, radiance_map.cu:163-166).
    """
    nx, ny, nz = grid.dims
    co = jnp.clip(((qpos - grid.origin) * grid.inv_cell).astype(jnp.int32),
                  0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    cell = (co[:, 0] * ny + co[:, 1]) * nz + co[:, 2]         # (N,)

    cand = grid.payload[cell]                                 # (N, K, 8)
    diff = cand[..., 0:3] - qpos[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)                        # (N, K)
    match = jnp.all(cand[..., 3:6] == qnorm[:, None, :], axis=-1)
    used = cand[..., 7] > 0.5
    big = jnp.float32(1.0e12)
    score = d2 + jnp.where(match, 0.0, big) + jnp.where(used, 0.0, 4.0 * big)
    best = jnp.argmin(score, axis=-1)
    idx = jnp.take_along_axis(cand[..., 6], best[:, None], axis=-1)[:, 0]
    any_used = jnp.any(used, axis=-1)
    return jnp.where(any_used, idx.astype(jnp.int32), 0)
