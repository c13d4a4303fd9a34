#!/usr/bin/env python
"""Work-bound simulation for the per-cluster ray-queue intersector.

The shortlist sweep pays TILE granularity: all LANE_B=128 lanes of a tile
brute-test every cluster ANY lane listed (measured 13.5 visits/tile on
knot290k bounce tiles after two-phase tightening). A ray-queue design
pays RAY granularity: each (ray, cluster) pair is tested exactly once.
This sim computes, on the cursor walk's true hits (ground truth), the
per-ray entered-cluster counts with phase-1 (far = first-hit cap) and
phase-2 (far = true t) tightening, and the implied brute-work ratio
vs the tile-granularity sweep. Pure CPU; run BEFORE burning chip time.

Run: [SCENE=ite-orb.xml] [RES=192] python scripts/sim_ray_queues.py
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
    from adapt_tpu.ops.intersect import ray_intersect, _sort_by, FAR
    from adapt_tpu.ops import cluster_pallas as cp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    res = int(os.environ.get("RES", "192"))
    cfg = dataclasses.replace(cfg, w=res, h=res,
                              focal=cfg.focal * res / min(cfg.w, cfg.h),
                              start_x=0, end_x=res, start_y=0, end_y=res)
    C = scene.cl_aabb.shape[0]
    CM = scene.cl_rows.shape[2]
    cl_lo = np.asarray(scene.cl_aabb[:, 0:3])     # (C,8): lo(3) hi(3) pad
    cl_hi = np.asarray(scene.cl_aabb[:, 3:6])

    key = jax.random.PRNGKey(0)
    ro, rd = camera_rays(scene, cfg, key, jnp.int32(0))
    N = ro.shape[0]
    k1, k2 = jax.random.split(key)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    o2 = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    d2 = jax.random.normal(k2, (N, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)

    cfg_cpu = dataclasses.replace(cfg, use_cluster=False, use_pallas=False)

    def slab_counts(o, d, far):
        """Per-ray number of clusters whose slab interval is non-empty."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t1 = (cl_lo[None] - o[:, None]) * inv[:, None]   # (N, C, 3)
        t2 = (cl_hi[None] - o[:, None]) * inv[:, None]
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        enter = (tf >= np.maximum(tn, 0.0)) & (tn <= far[:, None]) \
            & (tf > 0.0)
        return enter.sum(1), enter

    for tag, o, d in [("primary", ro, rd), ("bounce", o2, d2)]:
        it = ray_intersect(scene, cfg_cpu, o, d)
        t_true = np.asarray(it.t, np.float64)
        far1 = np.where(t_true > 0, t_true * (1 + 1e-5), FAR)

        n_inf, _ = slab_counts(o, d, np.full(N, FAR))
        n_ph2, _ = slab_counts(o, d, far1)
        # tile-granularity comparison: sort by the dispatch's cluster key,
        # count per-tile union of phase-2 entered clusters
        ckey = cp.primary_cluster_key(scene, jnp.asarray(o), jnp.asarray(d),
                                      jnp.full((N,), FAR, jnp.float32))
        order = np.argsort(np.asarray(ckey), kind="stable")
        _, enter2 = slab_counts(np.asarray(o)[order], np.asarray(d)[order],
                                far1[order])
        nt = N // cp.LANE_B
        tile_union = enter2[: nt * cp.LANE_B].reshape(
            nt, cp.LANE_B, C).any(1).sum(1)
        work_tile = tile_union.sum() * cp.LANE_B      # ray-cluster tests
        work_ray = n_ph2.sum()
        print(f"{tag}: per-ray clusters entered  "
              f"phase1(far=inf): mean {n_inf.mean():.2f} "
              f"p99 {np.percentile(n_inf, 99):.0f} max {n_inf.max()}")
        print(f"{tag}: per-ray clusters entered  "
              f"phase2(far=t):   mean {n_ph2.mean():.2f} "
              f"p99 {np.percentile(n_ph2, 99):.0f} max {n_ph2.max()}")
        print(f"{tag}: tile-union visits/tile {tile_union.mean():.1f} "
              f"-> brute-work ratio tile/ray = "
              f"{work_tile / max(work_ray, 1):.2f}x", flush=True)


if __name__ == "__main__":
    main()
