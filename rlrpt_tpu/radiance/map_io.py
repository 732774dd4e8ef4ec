"""Radiance-map text-format persistence (parity tooling).

Formats preserved from the reference:

* radiance_map_data.txt — first line the action count, then one
  `x y z q1..qS` row per volume (ref: radiance_map.cu:237-268
  save_q_vals_to_file; read back by NN_Q_Value_Trainer/Source/main.cu:73-116);
* selected volumes — `x y z nx ny nz p1..pS` rows of the (plain, non-
  cumulative) sampling distribution at probe points (ref: radiance_volume.cu:
  340-365 write_volume_to_file + radiance_map.cu:272-302), probe points read
  from to_select.txt (ref: hemisphere_helpers.cu:230-281);
* volume reload (ref: radiance_volume.cu:377-437).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.radiance.nn_search import find_closest_volume
from rlrpt_tpu.radiance.volumes import RadianceVolumes, rebuild_cdf
from rlrpt_tpu.ops.linalg import make_frame


def _fmt(x: float) -> str:
    return f"{float(x):.6g}"


def cdf_to_distribution(cdf: np.ndarray) -> np.ndarray:
    """Cumulative -> plain distribution (ref: radiance_volume.cu:331-336
    convert_radiance_distribution)."""
    out = np.asarray(cdf, np.float32).copy()
    out[..., 1:] = out[..., 1:] - out[..., :-1]
    return out


def save_q_vals_to_file(vols: RadianceVolumes, path: str) -> None:
    pos = np.asarray(vols.position)
    q = np.asarray(vols.q)
    s = q.shape[1]
    with open(path, "w") as f:
        f.write(f"{s}\n")
        for i in range(len(pos)):
            row = " ".join(_fmt(x) for x in pos[i])
            row += " " + " ".join(_fmt(x) for x in q[i])
            f.write(row + "\n")


def load_radiance_map_data(path: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Read radiance_map_data.txt -> (positions (V,3), q (V,S), action_count)
    (ref: NN_Q_Value_Trainer/Source/main.cu:73-116)."""
    with open(path) as f:
        action_count = int(f.readline().strip())
        pos, q = [], []
        for line in f:
            vals = [float(t) for t in line.split()]
            if not vals:
                continue
            pos.append(vals[:3])
            q.append(vals[3: 3 + action_count])
    return (np.asarray(pos, np.float32), np.asarray(q, np.float32),
            action_count)


def read_probe_points(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read to_select.txt probe `x y z nx ny nz` lines
    (ref: hemisphere_helpers.cu:230-281)."""
    locs, norms = [], []
    with open(path) as f:
        for line in f:
            vals = [float(t) for t in line.split()]
            if len(vals) >= 6:
                locs.append(vals[:3])
                norms.append(vals[3:6])
    return np.asarray(locs, np.float32), np.asarray(norms, np.float32)


def save_selected_volumes(vols: RadianceVolumes, probe_path: str,
                          out_path: str) -> None:
    """Dump the sampling distribution of the volume nearest each probe point
    (ref: radiance_map.cu:272-302 -> selected_sarsa.txt)."""
    locs, norms = read_probe_points(probe_path)
    idx = np.asarray(find_closest_volume(vols, jnp.asarray(locs),
                                         jnp.asarray(norms)))
    dist = cdf_to_distribution(np.asarray(vols.cdf))
    pos = np.asarray(vols.position)
    nrm = np.asarray(vols.normal)
    with open(out_path, "w") as f:
        for i in idx:
            row = list(pos[i]) + list(nrm[i]) + list(dist[i])
            f.write(" ".join(_fmt(x) for x in row) + "\n")


def load_volumes_from_selected(path: str, grid_resolution: int = 12
                               ) -> RadianceVolumes:
    """Rebuild RadianceVolumes from selected-volume rows
    (ref: radiance_volume.cu:377-437 read_radiance_volumes_from_file).
    The stored values are the plain distribution; q is set to it and the
    CDF rebuilt."""
    rows = []
    with open(path) as f:
        for line in f:
            vals = [float(t) for t in line.split()]
            if vals:
                rows.append(vals)
    arr = np.asarray(rows, np.float32)
    s = grid_resolution * grid_resolution
    pos, nrm, dist = arr[:, :3], arr[:, 3:6], arr[:, 6:6 + s]
    vols = RadianceVolumes(
        position=jnp.asarray(pos),
        normal=jnp.asarray(nrm),
        frame=make_frame(jnp.asarray(nrm)),
        surface_lum=jnp.ones((len(pos),), jnp.float32),
        q=jnp.asarray(dist),
        visits=jnp.zeros((len(pos), s), jnp.int32),
        cdf=jnp.cumsum(jnp.asarray(dist), axis=-1),
        grid_resolution=grid_resolution,
    )
    return vols


def save_volumes_npz(vols: RadianceVolumes, path: str) -> None:
    """Binary checkpoint of the full tabular state (the orbax-style
    equivalent of the reference's text dumps, SURVEY §5.4)."""
    np.savez_compressed(
        path, position=np.asarray(vols.position), normal=np.asarray(vols.normal),
        frame=np.asarray(vols.frame), surface_lum=np.asarray(vols.surface_lum),
        q=np.asarray(vols.q), visits=np.asarray(vols.visits),
        cdf=np.asarray(vols.cdf), grid_resolution=vols.grid_resolution)


def load_volumes_npz(path: str) -> RadianceVolumes:
    z = np.load(path)
    return RadianceVolumes(
        position=jnp.asarray(z["position"]), normal=jnp.asarray(z["normal"]),
        frame=jnp.asarray(z["frame"]), surface_lum=jnp.asarray(z["surface_lum"]),
        q=jnp.asarray(z["q"]), visits=jnp.asarray(z["visits"]),
        cdf=jnp.asarray(z["cdf"]), grid_resolution=int(z["grid_resolution"]))
