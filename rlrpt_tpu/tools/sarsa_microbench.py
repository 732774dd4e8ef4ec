"""Microbenchmark of the SARSA wavefront's per-iteration primitives.

Times, on the live backend, each data-movement primitive of one
sarsa_wavefront iteration at the bench shape (W rays, V volumes, S=144
sectors), in isolation:

  seg2       two segment_sums into V*S segments (current code)
  segf       ONE fused (W,2) segment_sum into V*S segments
  sort_seg   sort by id + indices_are_sorted segment_sum
  at_add     flat (V*S,) .at[f].add
  img_scat   (W,3) .at[pix].add image flush (per-iteration in current code)
  pay_gather (W,K,8) bucket payload row gather, K=64 and K=16
  cdf_gather (W,S) CDF row gather
  dense_pass apply_sarsa_contributions-shaped (V,S) elementwise pass
  irr        irradiance_estimates-shaped (V,S) reduction
  hit        closest_hit_packed on W rays (cornell, 114 tris)

Usage: python -m rlrpt_tpu.tools.sarsa_microbench [--w 518400] [--v 80000]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def _probe(out):
    """A scalar data-dependent on `out` (1-element slice per leaf)."""
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)


def timeit(fn, *args, reps=20):
    """Over the axon tunnel block_until_ready can return while work is
    still queued — the only reliable fence is a host materialisation.
    Chain a 1-element probe of every rep into one scalar and fetch it
    once; the probe's device cost is negligible, the single round-trip
    amortises over reps."""
    float(_probe(fn(*args)))                     # warm-up + flush queue
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = acc + _probe(fn(*args))
    float(acc)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=518400)
    ap.add_argument("--v", type=int, default=80000)
    ap.add_argument("--s", type=int, default=144)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)
    w, v, s = args.w, args.v, args.s
    vs = v * s

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    f = jax.random.randint(k1, (w,), 0, vs, dtype=jnp.int32)
    tgt = jax.random.uniform(k2, (w,), dtype=jnp.float32)
    msk = jax.random.uniform(k3, (w,)) < 0.9
    res = {}

    @jax.jit
    def seg2(f, tgt, msk):
        ff = jnp.where(msk, f, vs)
        ww = msk.astype(jnp.float32)
        a = jax.ops.segment_sum(tgt * ww, ff, num_segments=vs + 1)[:-1]
        b = jax.ops.segment_sum(ww, ff, num_segments=vs + 1)[:-1]
        return a, b

    @jax.jit
    def segf(f, tgt, msk):
        ff = jnp.where(msk, f, vs)
        ww = msk.astype(jnp.float32)
        d = jnp.stack([tgt * ww, ww], axis=-1)
        ab = jax.ops.segment_sum(d, ff, num_segments=vs + 1)[:-1]
        return ab

    @jax.jit
    def sort_seg(f, tgt, msk):
        ff = jnp.where(msk, f, vs)
        ww = msk.astype(jnp.float32)
        sf, sa, sb = jax.lax.sort((ff, tgt * ww, ww), dimension=0, num_keys=1)
        sd = jnp.stack([sa, sb], axis=-1)
        return jax.ops.segment_sum(sd, sf, num_segments=vs + 1,
                                   indices_are_sorted=True)[:-1]

    tbl = jnp.zeros((vs,), jnp.float32)

    @jax.jit
    def at_add(tbl, f, tgt, msk):
        ff = jnp.where(msk, f, vs - 1)
        return tbl.at[ff].add(jnp.where(msk, tgt, 0.0))

    img = jnp.zeros((w, 3), jnp.float32)
    pix = jax.random.permutation(k1, jnp.arange(w, dtype=jnp.int32))
    rad = jax.random.uniform(k2, (w, 3), dtype=jnp.float32)

    @jax.jit
    def img_scat(img, pix, rad, msk):
        return img.at[jnp.where(msk, pix, w - 1)].add(
            jnp.where(msk[:, None], rad, 0.0))

    res["seg2_ms"] = timeit(seg2, f, tgt, msk, reps=args.reps) * 1e3
    res["segf_ms"] = timeit(segf, f, tgt, msk, reps=args.reps) * 1e3
    res["sort_seg_ms"] = timeit(sort_seg, f, tgt, msk, reps=args.reps) * 1e3
    res["at_add_ms"] = timeit(at_add, tbl, f, tgt, msk, reps=args.reps) * 1e3
    res["img_scat_ms"] = timeit(img_scat, img, pix, rad, msk,
                                reps=args.reps) * 1e3

    for kk in (64, 16):
        pay = jax.random.uniform(k3, (200000, kk, 8), dtype=jnp.float32)
        cell = jax.random.randint(k1, (w,), 0, 200000, dtype=jnp.int32)

        @jax.jit
        def pay_gather(pay, cell):
            c = pay[cell]
            return jnp.sum(c, axis=(1, 2))

        res[f"pay_gather_k{kk}_ms"] = timeit(pay_gather, pay, cell,
                                             reps=args.reps) * 1e3

    cdf = jax.random.uniform(k2, (v, s), dtype=jnp.float32)
    vol = jax.random.randint(k1, (w,), 0, v, dtype=jnp.int32)

    @jax.jit
    def cdf_gather(cdf, vol, tgt):
        rows = cdf[vol]
        return jnp.sum(rows < tgt[:, None], axis=-1)

    res["cdf_gather_ms"] = timeit(cdf_gather, cdf, vol, tgt,
                                  reps=args.reps) * 1e3

    q = jax.random.uniform(k1, (v, s), dtype=jnp.float32)
    vis = jnp.zeros((v, s), jnp.float32)
    st = jax.random.uniform(k2, (v, s), dtype=jnp.float32)
    cnt = (jax.random.uniform(k3, (v, s)) < 0.01).astype(jnp.float32)

    @jax.jit
    def dense_pass(q, vis, st, cnt):
        qn = (q * (1.0 + vis) + st) / (1.0 + vis + cnt)
        qn = jnp.maximum(qn, 1e-5)
        qn = jnp.where(cnt > 0, qn, q)
        return qn, vis + cnt

    res["dense_pass_ms"] = timeit(dense_pass, q, vis, st, cnt,
                                  reps=args.reps) * 1e3

    cos = jax.random.uniform(k1, (s,), dtype=jnp.float32)
    lum = jax.random.uniform(k2, (v,), dtype=jnp.float32)

    @jax.jit
    def irr(q):
        return jnp.sum(q * cos[None, :], axis=-1) * lum

    res["irr_ms"] = timeit(irr, q, reps=args.reps) * 1e3

    # --- compaction primitives ------------------------------------------
    act = jax.random.uniform(k1, (w,)) < 0.5
    arange_w = jnp.arange(w, dtype=jnp.int32)
    vals = jax.random.uniform(k2, (w,), dtype=jnp.float32)

    @jax.jit
    def perm_set(act):
        m = jnp.sum(act.astype(jnp.int32))
        pos = jnp.where(act, jnp.cumsum(act) - 1, m + jnp.cumsum(~act) - 1)
        return jnp.zeros((w,), jnp.int32).at[pos].set(arange_w)

    res["perm_set_ms"] = timeit(perm_set, act, reps=args.reps) * 1e3

    perm = jax.random.permutation(k3, arange_w)

    @jax.jit
    def gather_1d(vals, perm):
        return vals[perm]

    res["gather_1d_ms"] = timeit(gather_1d, vals, perm, reps=args.reps) * 1e3

    @jax.jit
    def sort_kv(f, vals):
        return jax.lax.sort((f, vals), dimension=0, num_keys=1)

    res["sort_kv_ms"] = timeit(sort_kv, f, vals, reps=args.reps) * 1e3

    from rlrpt_tpu.ops.intersect_pallas import (closest_hit_packed,
                                                pack_triangles)
    from rlrpt_tpu.scene import cornell_box
    scene = cornell_box()
    tris = pack_triangles(scene)
    o = jnp.zeros((w, 3), jnp.float32)
    d = jax.random.normal(k1, (w, 3), dtype=jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    @jax.jit
    def hit(o, d):
        return closest_hit_packed(o, d, tris, jnp.int32(w))

    res["hit_ms"] = timeit(hit, o, d, reps=args.reps) * 1e3

    print(json.dumps({k: round(x, 3) for k, x in res.items()}))


if __name__ == "__main__":
    main()
