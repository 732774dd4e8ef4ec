"""Bake a trained radiance map into a per-(triangle x uv-bin) CDF table.

The SARSA wavefront's per-bounce cost is ~88% dynamic gathers (cdf row +
answer-table row, SARSA_BENCH.json r4_ablation): on TPU a dynamic gather
is latency-bound (~10 ns/query) no matter how small the row.  For a
FROZEN map (inference after training — the reference's own interactive
mode, reinforcement_path_tracing.cu:100-115, samples a fixed per-frame
CDF inside its render kernel) the distribution can instead be re-keyed so
the render kernel needs NO gather at all:

* key   = (hit triangle, quantised barycentric uv)  — both already live
  in the megakernel's Moller-Trumbore sweep (the winning triangle's
  u'/det, v'/det fall out of the same one-hot reduction that fetches the
  material row), so the lookup index is pure arithmetic;
* value = a bf16 CDF COLUMN of a (S, C) table resident in VMEM, fetched
  per-ray with a one-hot matmul on the MXU — the same no-gather pattern
  as the megakernel's material fetch (ops/megakernel.py mat_dot).

C = t_pad * uv_bins^2 stays small (cornell: 32 * 16 = 512 columns,
128 KB in bf16), so the fetch is one (S_pad, C) @ (C, r) bf16 matmul per
bounce — MXU work instead of serialised HBM latency.

The bake itself is host-side numpy, once per trained map:

1. every radiance volume is assigned to its (triangle, uv-bin) — volume
   order is deterministic (geometry.sample_points_on_triangles repeats
   triangles in order), so tri ids re-derive from volume_counts;
2. per-volume sector pmfs (diff of the trained CDF rows, i.e. exactly
   the distribution the wavefront sampler draws from) are averaged per
   bin; empty bins fall back to the nearest same-normal volume (the
   bounded-reach search's class filter, radiance_map.cu:150-166), then
   to uniform;
3. the 12x12 sector grid is optionally re-binned to sector_grid x
   sector_grid on the unit square.  Chiu's concentric map is
   area-preserving square -> hemisphere (solid angle d(cos t) dphi =
   2 r dr dphi, hemisphere_helpers.cu:134-226), so square-area overlap
   re-binning is EXACT in solid angle.  The default 11 (121 sectors ->
   128 padded) keeps the fetch matmul's M dimension inside one 128-row
   MXU tile; the reference's 144 would spill into a second tile (~44%
   more matmul time for 18% more sectors).

Unbiasedness: the render kernel draws the sector by comparing a uniform
against these rows and computes the pdf from the SAME rows (hi - lo in
f32; bf16 values are f32-exact), so pdf == true sampling probability —
the bake changes the guidance distribution (quantised spatially), never
the estimator.  Any pmf here yields an unbiased image; only variance
depends on bake fidelity.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.config import RadianceVolumeConfig
from rlrpt_tpu.radiance.volumes import RadianceVolumes, volume_counts
from rlrpt_tpu.scene.scene import Scene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriBinCDF:
    """Frozen guidance table for the guided megakernel.

    cdf: (S_pad, C) — per-column CDFs over the sector grid, bf16;
    padding rows (>= n_sectors) hold 2.0 sentinels (never < a uniform).
    Column layout: c = tri * uv_bins^2 + iu * uv_bins + iv with
    iu = floor(u * uv_bins), iv = floor(v * uv_bins) of the barycentric
    hit coordinates (u along v1-v0, v along v2-v0).
    """
    cdf: jnp.ndarray
    sector_grid: int = dataclasses.field(metadata=dict(static=True))
    uv_bins: int = dataclasses.field(metadata=dict(static=True))
    t_pad: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_sectors(self) -> int:
        return self.sector_grid * self.sector_grid

    @property
    def n_columns(self) -> int:
        return self.t_pad * self.uv_bins * self.uv_bins


def _overlap_1d(g_dst: int, g_src: int) -> np.ndarray:
    """(g_dst, g_src) fractions of source interval j inside dst interval i
    (uniform grids on [0, 1]); columns sum to 1."""
    lo_d = np.arange(g_dst)[:, None] / g_dst
    hi_d = lo_d + 1.0 / g_dst
    lo_s = np.arange(g_src)[None, :] / g_src
    hi_s = lo_s + 1.0 / g_src
    ov = np.minimum(hi_d, hi_s) - np.maximum(lo_d, lo_s)
    return np.maximum(ov, 0.0) * g_src


def rebin_sector_pmf(pmf: np.ndarray, g_src: int, g_dst: int) -> np.ndarray:
    """Re-bin (..., g_src^2) sector pmfs onto a g_dst^2 grid, exactly in
    solid angle (see module docstring).  Sector index = sx * g + sy."""
    if g_src == g_dst:
        return pmf
    o = _overlap_1d(g_dst, g_src)
    m = np.kron(o, o)                       # (g_dst^2, g_src^2)
    return pmf @ m.T


def bake_tri_bin_cdf(scene: Scene, vols: RadianceVolumes,
                     rl: RadianceVolumeConfig, t_pad: int,
                     uv_bins: int = 4, sector_grid: int = 11,
                     defensive_mix: float = 0.0,
                     dtype=jnp.bfloat16) -> TriBinCDF:
    """Bake `vols`' trained sampling distribution into a TriBinCDF.

    t_pad: the megakernel's padded triangle count for this scene
    (ops.megakernel._t_pad over n_triangles) so column indices match the
    kernel's triangle ids.  defensive_mix blends uniform mass in AFTER
    aggregation (same semantics as volumes.rebuild_cdf's defensive_mix;
    pass rl.defensive_mix to match a training run that used it —
    vols.cdf already contains the trained mix, this re-applies only if
    you bake from q instead).
    """
    ns = scene.n_surfaces
    s12 = vols.n_sectors
    g12 = vols.grid_resolution
    s_k = sector_grid * sector_grid
    c = t_pad * uv_bins * uv_bins

    counts = volume_counts(scene, rl)
    v = vols.n_volumes
    if int(counts.sum()) != v:
        raise ValueError(
            f"volume_counts(scene, rl) sums to {int(counts.sum())} but the "
            f"map has {v} volumes — bake needs the same (scene, rl) the map "
            "was built with to re-derive per-volume triangle ids")
    tri_idx = np.repeat(np.arange(ns), counts)              # (V,)

    pos = np.asarray(vols.position, np.float64)
    v0 = np.asarray(scene.v0, np.float64)
    e1 = np.asarray(scene.v1, np.float64) - v0
    e2 = np.asarray(scene.v2, np.float64) - v0

    # Barycentric coordinates of each volume on its triangle (points lie
    # in-plane; normal equations are exact up to rounding).
    t1, t2 = e1[tri_idx], e2[tri_idx]
    d = pos - v0[tri_idx]
    a11 = np.sum(t1 * t1, axis=1)
    a12 = np.sum(t1 * t2, axis=1)
    a22 = np.sum(t2 * t2, axis=1)
    b1 = np.sum(d * t1, axis=1)
    b2 = np.sum(d * t2, axis=1)
    det = np.maximum(a11 * a22 - a12 * a12, 1e-30)
    u = (a22 * b1 - a12 * b2) / det
    w = (a11 * b2 - a12 * b1) / det
    iu = np.clip(np.floor(u * uv_bins).astype(np.int64), 0, uv_bins - 1)
    iv = np.clip(np.floor(w * uv_bins).astype(np.int64), 0, uv_bins - 1)
    col = tri_idx * uv_bins * uv_bins + iu * uv_bins + iv   # (V,)

    # Per-volume pmf = diff of the trained CDF — exactly the distribution
    # the wavefront sampler draws from (incl. any trained defensive mix).
    cdf = np.asarray(vols.cdf, np.float64)
    pmf = np.diff(cdf, axis=1, prepend=0.0)
    pmf = np.maximum(pmf, 0.0)

    sums = np.zeros((c, s12))
    np.add.at(sums, col, pmf)
    n_mem = np.bincount(col, minlength=c).astype(np.float64)

    # Empty-bin fallback: nearest same-normal volume to the bin's
    # representative point, else nearest any, else uniform.
    empty = np.flatnonzero(n_mem == 0)
    surf_empty = empty[empty < ns * uv_bins * uv_bins]
    if len(surf_empty) and v:
        from scipy.spatial import cKDTree
        tree = cKDTree(pos)
        tri_e = surf_empty // (uv_bins * uv_bins)
        rem = surf_empty % (uv_bins * uv_bins)
        uc = (rem // uv_bins + 0.5) / uv_bins
        vc = (rem % uv_bins + 0.5) / uv_bins
        over = uc + vc > 1.0                # bins crossing the diagonal:
        scale = np.where(over, 0.95 / (uc + vc), 1.0)
        rep = (v0[tri_e] + (scale * uc)[:, None] * e1[tri_e]
               + (scale * vc)[:, None] * e2[tri_e])
        k = min(16, v)
        _, nbr = tree.query(rep, k=k)
        nbr = nbr.reshape(len(surf_empty), k)
        nrm_v = np.asarray(vols.normal, np.float32)
        nrm_t = np.asarray(scene.normal, np.float32)[tri_e]
        same = np.all(nrm_v[nbr] == nrm_t[:, None, :], axis=-1)  # (E, k)
        # first same-class neighbour, else nearest any
        first_same = np.argmax(same, axis=1)
        pick = np.where(same.any(axis=1), first_same, 0)
        chosen = nbr[np.arange(len(surf_empty)), pick]
        sums[surf_empty] = pmf[chosen]
        n_mem[surf_empty] = 1.0

    p = sums / np.maximum(n_mem, 1.0)[:, None]              # (C, S12)
    p_k = rebin_sector_pmf(p, g12, sector_grid)             # (C, S_k)
    total = p_k.sum(axis=1, keepdims=True)
    p_k = np.where(total > 1e-12, p_k / np.maximum(total, 1e-12), 1.0 / s_k)
    if defensive_mix:
        p_k = (1.0 - defensive_mix) * p_k + defensive_mix / s_k

    cdf_k = np.cumsum(p_k, axis=1)
    cdf_k[:, -1] = 1.0                                      # exact top
    s_pad = int(math.ceil(s_k / 8) * 8)
    out = np.full((c, s_pad), 2.0, np.float32)
    out[:, :s_k] = cdf_k
    return TriBinCDF(cdf=jnp.asarray(out.T).astype(dtype),
                     sector_grid=sector_grid, uv_bins=uv_bins, t_pad=t_pad)
