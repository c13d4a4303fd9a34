#!/usr/bin/env python
"""Simulate the CLUSTER-MAJOR (inverted) intersector decomposition on CPU.

Design under study: instead of tiles sweeping per-tile shortlist unions,
expand each ray into K work items — its K front-most entered clusters —
sort items by cluster id, and let each 128-item tile test only the
distinct cluster ids it contains (1-3 after the sort). Rays entering
more than K clusters fall back to the classic shortlist sweep with
far tightened by the expansion round (exactness preserved).

Reports, per scene and ray class:
  - expansion items/ray, tiles, distinct-cluster visits per tile
  - fallback fraction (rays with >K entered clusters before their
    round-1 t_best)
  - comparison with the current two-phase tile design's visit counts
Pure CPU. Use BEFORE burning chip time (CLAUDE.md rule 9).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.base import camera_rays
    from adapt_tpu.ops.intersect import ray_intersect, FAR

    K = int(os.environ.get("K", "2"))
    B = 128
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    res = int(os.environ.get("RES", "192"))
    cfg = dataclasses.replace(cfg, w=res, h=res,
                              focal=cfg.focal * res / min(cfg.w, cfg.h),
                              start_x=0, end_x=res, start_y=0, end_y=res)
    C = scene.cl_aabb.shape[0]
    lo = np.asarray(scene.cl_aabb[:, 0:3])
    hi = np.asarray(scene.cl_aabb[:, 3:6])
    # prim gid -> cluster id (for "which cluster holds the true hit")
    gids = np.asarray(scene.cl_rows[:, 13, :]).astype(np.int64)
    P = int(np.asarray(scene.prim_ng).shape[0])
    prim2cl = np.full(P, -1, np.int64)
    for c in range(C):
        g = gids[c]
        prim2cl[g[g >= 0]] = c

    key = jax.random.PRNGKey(0)
    ro, rd = camera_rays(scene, cfg, key, jnp.int32(0))
    N = ro.shape[0]
    k1, k2 = jax.random.split(key)
    lo3 = jnp.min(scene.obj_aabb_min, axis=0)
    hi3 = jnp.max(scene.obj_aabb_max, axis=0)
    o2 = jax.random.uniform(k1, (N, 3)) * (hi3 - lo3) + lo3
    d2 = jax.random.normal(k2, (N, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)

    cfg_cpu = dataclasses.replace(cfg, use_cluster=False, use_pallas=False)

    for tag, o, d in [("primary", ro, rd), ("bounce", o2, d2)]:
        on = np.asarray(o)
        dn = np.asarray(d)
        inv = 1.0 / np.where(np.abs(dn) < 1e-9, 1e-9, dn)
        # per-ray entry distance per cluster, blocked
        BS = 8192
        topk = np.full((N, K), C, np.int64)
        topk_e = np.full((N, K), np.inf, np.float32)
        counts = np.zeros(N, np.int64)
        for s in range(0, N, BS):
            e = min(N, s + BS)
            t1 = (lo[None] - on[s:e, None]) * inv[s:e, None]
            t2 = (hi[None] - on[s:e, None]) * inv[s:e, None]
            tn = np.minimum(t1, t2).max(-1)
            tf = np.maximum(t1, t2).min(-1)
            hit = tf >= np.maximum(tn, 0.0)
            entry = np.where(hit, np.maximum(tn, 0.0), np.inf)
            counts[s:e] = hit.sum(1)
            idx = np.argsort(entry, axis=1)[:, :K]
            ee = np.take_along_axis(entry, idx, 1)
            v = np.isfinite(ee)
            topk[s:e] = np.where(v, idx, C)
            topk_e[s:e] = ee

        it = ray_intersect(scene, cfg_cpu, o, d)
        t_true = np.asarray(it.t)
        # prim_id is clamped to 0 on miss — the hit flag is obj_id >= 0
        hit_cl = np.where(np.asarray(it.obj_id) >= 0,
                          prim2cl[np.clip(np.asarray(it.prim_id), 0, P - 1)],
                          -1)
        covered = (hit_cl[:, None] == topk).any(1) | (hit_cl < 0)
        # fallback: rays with >K entered clusters whose (K+1)-th entry
        # could precede their round-1 t_best (conservative: t_best = true
        # t if its cluster is covered else FAR)
        t_r1 = np.where(covered & (hit_cl >= 0), t_true, FAR)
        fallback = counts > K
        # tighten: only rays where some unvisited cluster enters before
        # t_r1 matter; K-th entry is a lower bound for unvisited entries
        kth = topk_e[:, K - 1]
        fallback &= ~np.isinf(kth) & (kth < t_r1 * (1 + 1e-5))

        # expansion tiles: items sorted by cid (dead items -> C)
        items = topk.reshape(-1)
        items = np.sort(items)
        nt = -(-len(items) // B)
        pad = nt * B - len(items)
        items = np.concatenate([items, np.full(pad, C, np.int64)])
        tiles = items.reshape(nt, B)
        live_tiles = (tiles < C).any(1)
        visits = np.array([len(np.unique(r[r < C])) for r in tiles])
        print(f"{tag}: items/ray={np.minimum(counts, K).mean():.2f} "
              f"uncovered_hits={100 * (~covered).mean():.2f}% "
              f"fallback={100 * fallback.mean():.2f}% "
              f"live_tiles={int(live_tiles.sum())}/{nt} "
              f"visits/live_tile={visits[live_tiles].mean():.2f} "
              f"total_visits={int(visits.sum())}", flush=True)
        # current design reference: visits/tile from per-tile union
        # (see scripts/sim_early_exit.py for the exact replay)
        print(f"{tag}: per-ray count mean={counts.mean():.2f} "
              f"p99={np.percentile(counts, 99):.0f} max={counts.max()}",
              flush=True)


if __name__ == "__main__":
    main()
