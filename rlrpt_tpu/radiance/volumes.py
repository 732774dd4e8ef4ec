"""Radiance volumes — the tabular Q-state of the expected-SARSA tracer.

The reference stores one RadianceVolume object per sampled scene point with
a 12x12 Q-grid, a CDF, visit counts and an incrementally-maintained
irradiance accumulator, updated with CUDA atomics
(ref: GPU_Rendering_Engine/Source/radiance_volumes/radiance_volume.cu).

The TPU-native re-design is one SoA pytree of (V, S) arrays:

* TD updates are deterministic batched `segment_sum` reductions.  The
  reference applies per-ray sequential updates Q <- (1-a)Q + a*target with
  a = 1/(1+visits) under racy atomicExch (last-writer-wins).  For k
  contributions in one batch the exact sequential composition of that
  running-mean recurrence is

      Q' = (Q*(1+visits) + sum(targets)) / (1 + visits + k)

  which is what `expected_sarsa_update` applies — equivalent to the
  reference's math with a deterministic order, minus its data race (SURVEY
  §5.2; the thesis itself flags the race as "approximate").
* The irradiance accumulator is not stored; it is recomputed exactly from
  the Q grid on demand (`irradiance_estimates`), removing the reference's
  stale/racy incremental accumulator (radiance_volume.cu:94-112) at the
  cost of one fused (V, S) reduction.
* cos(theta) per sector is a constant (S,) table (see ops/hemisphere.py).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.config import RHO, RadianceVolumeConfig
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.linalg import make_frame
from rlrpt_tpu.scene.geometry import sample_points_on_triangles
from rlrpt_tpu.scene.scene import Scene, surface_areas


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RadianceVolumes:
    position: jnp.ndarray      # (V, 3)
    normal: jnp.ndarray        # (V, 3)
    frame: jnp.ndarray         # (V, 3, 3) hemisphere local->world rotations
    surface_lum: jnp.ndarray   # (V,) luminance of the host surface material
    q: jnp.ndarray             # (V, S) radiance grid (the Q table)
    visits: jnp.ndarray        # (V, S) int32
    cdf: jnp.ndarray           # (V, S) cumulative sampling distribution
    grid_resolution: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_volumes(self) -> int:
        return self.position.shape[0]

    @property
    def n_sectors(self) -> int:
        return self.grid_resolution * self.grid_resolution


def volume_counts(scene: Scene, cfg: RadianceVolumeConfig) -> np.ndarray:
    """Volumes per surface triangle = floor(area / AREA_PER_SAMPLE)
    (ref: radiance_map.cu:60-67)."""
    return np.floor(surface_areas(scene) / cfg.area_per_sample).astype(np.int64)


def build_radiance_volumes(scene: Scene, cfg: RadianceVolumeConfig,
                           seed: int = 1984) -> RadianceVolumes:
    """Uniformly sample volumes over the scene's surfaces
    (ref: radiance_map.cu:72-84) and initialise the Q state
    (ref: radiance_volume.cu:49-89).

    The initial CDF is the proper uniform CDF ((i+1)/S).  The reference
    initialises a ramp i/S whose last entry is 143/144 (radiance_volume.cu:
    73-78), so its binary search fails for r > 143/144 and returns a zero
    direction on the first frame — a bug we do not reproduce.
    """
    rng = np.random.default_rng(seed)
    counts = volume_counts(scene, cfg)
    ns = scene.n_surfaces
    v0 = np.asarray(scene.v0, np.float64)[:ns]
    v1 = np.asarray(scene.v1, np.float64)[:ns]
    v2 = np.asarray(scene.v2, np.float64)[:ns]
    pos, tri_idx = sample_points_on_triangles(rng, v0, v1, v2, counts)

    normals = np.asarray(scene.normal, np.float32)[:ns][tri_idx]
    lum = np.asarray(scene.luminance, np.float32)[:ns][tri_idx]

    v = len(pos)
    s = cfg.n_sectors
    q0 = np.full((v, s), cfg.initial_radiance, np.float32)
    cdf0 = np.tile((np.arange(1, s + 1, dtype=np.float32) / s), (v, 1))

    frame = make_frame(jnp.asarray(normals))
    return RadianceVolumes(
        position=jnp.asarray(pos, jnp.float32),
        normal=jnp.asarray(normals),
        frame=frame,
        surface_lum=jnp.asarray(lum),
        q=jnp.asarray(q0),
        visits=jnp.zeros((v, s), jnp.int32),
        cdf=jnp.asarray(cdf0),
        grid_resolution=cfg.grid_resolution,
    )


def irradiance_estimates(vols: RadianceVolumes) -> jnp.ndarray:
    """Per-volume irradiance estimate (V,).

    ref: radiance_volume.cu:49-69 accumulates sum_s cos_s*(lum/pi)*Q_s and
    :305-307 scales by 2*pi/S; we compute it exactly from the live Q grid.
    """
    cos = hs.sector_cos_thetas(vols.grid_resolution)  # (S,)
    s = vols.n_sectors
    acc = jnp.sum(vols.q * cos[None, :], axis=-1) * (vols.surface_lum / math.pi)
    return acc * (2.0 * math.pi / s)


def rebuild_cdf(vols: RadianceVolumes,
                distribution_threshold: float = 0.0,
                defensive_mix: float = 0.0) -> RadianceVolumes:
    """Per-frame CDF rebuild from Q*cos weights
    (ref: radiance_volume.cu:149-188 update_radiance_distribution, launched
    once per frame by reinforcement_path_tracing.cu:6-13).

    The reference's per-volume sequential cumsum becomes one vectorised
    (V, S) cumsum.

    defensive_mix > 0 blends `mix * uniform` into the normalised
    distribution (defensive importance sampling): the reference's pure
    cos-weighted CDF assigns near-zero probability to grazing sectors,
    which under-samples grazing-visibility emitters catastrophically
    (EVAL.json simple_room diagnosis — its flush wall panel is visible
    from the brightest surface only at grazing incidence).  The mixture
    keeps every sector's pdf >= mix/S * RHO/GRID_RHO, bounding the
    importance weights; pdf consistency is automatic (the sampler reads
    the same CDF).  0.0 reproduces the reference exactly.
    """
    cos = hs.sector_cos_thetas(vols.grid_resolution)
    w = vols.q * cos[None, :]
    w = jnp.maximum(w, distribution_threshold)
    total = 1e-10 + jnp.sum(w, axis=-1, keepdims=True)
    p = w / total
    if defensive_mix:
        p = (1.0 - defensive_mix) * p + defensive_mix / vols.n_sectors
    cdf = jnp.cumsum(p, axis=-1)
    return dataclasses.replace(vols, cdf=cdf)


def sample_from_cdf(key, vols: RadianceVolumes, vol_idx: jnp.ndarray,
                    grid_rho: float):
    """Inverse-CDF sector sampling + in-sector jitter for rays parked at
    volumes `vol_idx` (N,).

    Returns (direction (N,3), sector (N,), pdf (N,)).
    ref: radiance_volume.cu:192-244 — sector = first index with
    cdf[i] > r (binary search there, a vectorised comparison count here);
    pdf = RHO * (p_sector / GRID_RHO).
    """
    rows = vols.cdf[vol_idx]                      # (N, S)
    frames = vols.frame[vol_idx]
    return sample_from_cdf_rows(key, rows, frames, grid_rho,
                                vols.grid_resolution)


def sample_from_cdf_rows(key, rows: jnp.ndarray, frames: jnp.ndarray,
                         grid_rho: float, grid_resolution: int):
    """sample_from_cdf on pre-gathered CDF rows (N, S) and hemisphere
    frames (N, 3, 3).  Callers that already paid a row gather (e.g. the
    SARSA wavefront's fused cdf+irradiance row) reuse it here — on TPU
    every dynamic gather costs ~4-6 ms per 518400 queries regardless of
    row size, so fusing gathers is the whole game."""
    s = grid_resolution * grid_resolution
    n = rows.shape[0]
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (n, 1), dtype=jnp.float32)
    sector = jnp.sum(rows < r, axis=-1).astype(jnp.int32)
    sector = jnp.minimum(sector, s - 1)
    # hi/lo via one-hot reductions over the row already in registers —
    # NOT take_along_axis: a per-row dynamic index is a latency-bound
    # gather (~0.6 ms per 64.8k rays on a v5e), and the r4 ablation
    # showed the two of them dominating the whole SARSA frame.  The
    # one-hot selects are exact (same row values), so results are
    # bitwise identical.
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, s), 1)
    hi = jnp.sum(jnp.where(iota == sector[:, None], rows, 0.0), axis=-1)
    lo = jnp.sum(jnp.where(iota == sector[:, None] - 1, rows, 0.0), axis=-1)
    # The LAST sector absorbs all r >= cdf[S-2], so its true sampling
    # probability is 1 - lo, not cdf[S-1] - lo: with f32 rows the gap
    # 1 - cdf[S-1] is ~1e-7 cumsum noise, but bf16 rows round near-1.0
    # values on a 2^-9 grid, where hi != 1 would bias the pdf by up to
    # ~0.4% absolute (ADVICE r4).  hi = 1 keeps pdf == true probability
    # for every cdf dtype.
    hi = jnp.where(sector == s - 1, 1.0, hi)
    pdf = RHO * ((hi - lo) / grid_rho)
    d = hs.sample_sector_direction(k2, sector, frames, grid_resolution)
    return d, sector, pdf


def sample_from_cdf_bsearch(key, vols: RadianceVolumes, vol_idx: jnp.ndarray,
                            grid_rho: float):
    """sample_from_cdf without materialising the (N, S) CDF rows.

    The row gather costs ~S x the useful traffic; a branchless binary search
    over the FLAT (V*S,) CDF touches ceil(log2 S)+2 scalars per ray instead
    (the reference device code also binary-searches its per-volume CDF,
    radiance_volume.cu:192-217).  Identical distribution to sample_from_cdf;
    the drawn uniforms match it bitwise (same split / same stream).
    """
    s = vols.n_sectors
    n = vol_idx.shape[0]
    flat = vols.cdf.reshape(-1)
    base = vol_idx * s
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (n,), dtype=jnp.float32)

    # Branchless lower-bound: after the loop, lo = #entries < r.
    lo = jnp.zeros((n,), jnp.int32)
    width = 1 << (s - 1).bit_length()             # next pow2 >= S
    while width > 0:
        mid = lo + width
        ok = mid <= s
        idx = base + jnp.minimum(mid, s) - 1
        val = jnp.where(ok, flat[idx], jnp.float32(jnp.inf))
        lo = jnp.where(val < r, jnp.minimum(mid, s), lo)
        width >>= 1
    sector = jnp.minimum(lo, s - 1).astype(jnp.int32)

    hi = jnp.where(sector == s - 1, 1.0, flat[base + sector])
    prev = jnp.where(sector > 0, flat[base + jnp.maximum(sector - 1, 0)], 0.0)
    pdf = RHO * ((hi - prev) / grid_rho)
    frames = vols.frame[vol_idx]
    d = hs.sample_sector_direction(k2, sector, frames, vols.grid_resolution)
    return d, sector, pdf


def hier_cdf_tables(cdf: jnp.ndarray, grid_resolution: int):
    """Split a (V, S) per-volume CDF into two-level inverse-CDF tables.

    Returns (cdf_coarse (V, G), cdf_fine (V*G, G)) with G = grid_resolution
    (S = G*G): coarse over the G hemisphere-grid ROWS (group masses), fine
    normalised within each row.  Sampling group-then-sector draws from
    exactly the same distribution as the flat inverse CDF (product
    decomposition of the pmf), but a query gathers two G-entry rows
    (2*4G bytes) instead of one S-entry row (4G^2 bytes) — 6x less
    gather traffic at the reference's G = 12.  The CDF is constant within
    a frame (rebuilt once per frame, reinforcement_path_tracing.cu:6-13),
    so integrators derive these once before the bounce loop.
    """
    g = grid_resolution
    v = cdf.shape[0]
    ends = cdf.reshape(v, g, g)[:, :, -1]                    # (V, G)
    starts = jnp.concatenate([jnp.zeros((v, 1), cdf.dtype), ends[:, :-1]],
                             axis=1)
    mass = jnp.maximum(ends - starts, 0.0)                   # (V, G)
    cdf_coarse = ends                                        # == cumsum(mass)
    fine = ((cdf.reshape(v, g, g) - starts[:, :, None])
            / jnp.maximum(mass, 1e-12)[:, :, None])
    return cdf_coarse, fine.reshape(v * g, g)


def sample_from_cdf_hier(key, cdf_coarse: jnp.ndarray, cdf_fine: jnp.ndarray,
                         frames: jnp.ndarray, vol_idx: jnp.ndarray,
                         grid_rho: float, grid_resolution: int):
    """Two-level inverse-CDF sector sampling (see hier_cdf_tables).

    frames: (N, 3, 3) hemisphere frames of the queried volumes (gathered
    by the caller).  Same distribution as sample_from_cdf; uses two
    uniforms instead of one, so the threefry stream differs (statistical,
    not bitwise, equivalence — like the reference's cuRAND, SURVEY §7).
    """
    g = grid_resolution
    n = vol_idx.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)

    rows_c = cdf_coarse[vol_idx]                             # (N, G)
    u1 = jax.random.uniform(k1, (n, 1), dtype=jnp.float32)
    grp = jnp.minimum(jnp.sum(rows_c < u1, axis=-1), g - 1).astype(jnp.int32)
    hi_c = jnp.where(grp == g - 1, 1.0,
                     jnp.take_along_axis(rows_c, grp[:, None], axis=-1)[:, 0])
    lo_c = jnp.where(grp > 0,
                     jnp.take_along_axis(rows_c,
                                         jnp.maximum(grp - 1, 0)[:, None],
                                         axis=-1)[:, 0], 0.0)
    p_grp = hi_c - lo_c

    rows_f = cdf_fine[vol_idx * g + grp]                     # (N, G)
    u2 = jax.random.uniform(k2, (n, 1), dtype=jnp.float32)
    j = jnp.minimum(jnp.sum(rows_f < u2, axis=-1), g - 1).astype(jnp.int32)
    hi_f = jnp.where(j == g - 1, 1.0,
                     jnp.take_along_axis(rows_f, j[:, None], axis=-1)[:, 0])
    lo_f = jnp.where(j > 0,
                     jnp.take_along_axis(rows_f,
                                         jnp.maximum(j - 1, 0)[:, None],
                                         axis=-1)[:, 0], 0.0)
    sector = grp * g + j
    pdf = RHO * (p_grp * (hi_f - lo_f) / grid_rho)
    d = hs.sample_sector_direction(k3, sector, frames, grid_resolution)
    return d, sector, pdf


def sample_max_from_cdf(key, vols: RadianceVolumes, vol_idx: jnp.ndarray,
                        grid_rho: float):
    """Greedy max-Q sector variant (ref: radiance_volume.cu:248-278)."""
    s = vols.n_sectors
    qrows = vols.q[vol_idx]
    sector = jnp.argmax(qrows, axis=-1).astype(jnp.int32)
    rows = vols.cdf[vol_idx]
    hi = jnp.take_along_axis(rows, sector[:, None], axis=-1)[:, 0]
    lo = jnp.where(sector > 0,
                   jnp.take_along_axis(rows, jnp.maximum(sector - 1, 0)[:, None],
                                       axis=-1)[:, 0],
                   hi)  # ref uses cdf[0]-cdf[0]=... max_idx==0 -> prev=same
    pdf = RHO * ((hi - lo) / grid_rho)
    frames = vols.frame[vol_idx]
    d = hs.sample_sector_direction(key, sector, frames, vols.grid_resolution)
    return d, sector, pdf


def sarsa_contributions(vol_idx: jnp.ndarray, sector: jnp.ndarray,
                        target: jnp.ndarray, mask: jnp.ndarray,
                        n_volumes: int, n_sectors: int):
    """Deterministic scatter of per-ray TD contributions onto the (V, S)
    grid.  Returns (sum_targets (V,S), counts (V,S)).  Exposed separately so
    the sharded path can psum partial contributions across devices before
    applying one identical update (SURVEY §2.7 row "atomics")."""
    v, s = n_volumes, n_sectors
    flat = vol_idx * s + sector
    flat = jnp.where(mask, flat, v * s)  # park masked entries on a dump slot
    w = mask.astype(jnp.float32)
    # Two scalar segment_sums, NOT one fused (W, 2) scatter: measured on a
    # v5e, the row-vector scatter is 3.2x SLOWER than the two scalar ones
    # (40.4 ms vs 12.5 ms at W = 518400 into V*S ~ 1.2e7 segments).
    sum_t = jax.ops.segment_sum(target * w, flat, num_segments=v * s + 1)[:-1]
    cnt = jax.ops.segment_sum(w, flat, num_segments=v * s + 1)[:-1]
    return sum_t.reshape(v, s), cnt.reshape(v, s)


def apply_sarsa_contributions(vols: RadianceVolumes, sum_t: jnp.ndarray,
                              cnt: jnp.ndarray,
                              radiance_threshold: float) -> RadianceVolumes:
    """Apply batched contributions with the exact sequential composition of
    the reference's running-mean recurrence (see module docstring)."""
    visits = vols.visits.astype(jnp.float32)
    q_new = (vols.q * (1.0 + visits) + sum_t) / (1.0 + visits + cnt)
    q_new = jnp.maximum(q_new, radiance_threshold)
    q_new = jnp.where(cnt > 0, q_new, vols.q)
    visits_new = vols.visits + cnt.astype(jnp.int32)
    return dataclasses.replace(vols, q=q_new, visits=visits_new)


def expected_sarsa_update(vols: RadianceVolumes, vol_idx: jnp.ndarray,
                          sector: jnp.ndarray, target: jnp.ndarray,
                          mask: jnp.ndarray,
                          radiance_threshold: float,
                          axis_name: str | None = None) -> RadianceVolumes:
    """Batched expected-SARSA TD update (ref: radiance_volume.cu:283-301).

    vol_idx, sector, target, mask: (N,) per-ray contributions; masked-out
    entries are dropped.  Under shard_map (`axis_name` set) the partial
    contributions are psum'd over the ray axis so every device applies the
    same update to its replicated Q-table.
    """
    sum_t, cnt = sarsa_contributions(vol_idx, sector, target, mask,
                                     vols.n_volumes, vols.n_sectors)
    if axis_name is not None:
        sum_t = jax.lax.psum(sum_t, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    return apply_sarsa_contributions(vols, sum_t, cnt, radiance_threshold)
