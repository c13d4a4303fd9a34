#!/usr/bin/env python
"""Coverage simulation for the majority-round intersector idea.

Design under test: sort rays by their FIRST entered cluster id; each
LANE_B tile visits exactly ONE cluster per round (the majority pending
candidate of its lanes) — no per-entry while-loop steps, no gates, one
DMA + one brute test per tile per round. Lanes whose needed entries are
all visited are covered; the rest go to the exact union cleanup pass.

This sim computes, on cursor-walk ground truth (CPU, RES^2 camera rays
plus one sampled diffuse bounce for realistic coherence):
  - per-round tile "majority share" (lanes whose pending candidate is
    the tile's pick),
  - per-ray coverage after R rounds: every entered cluster with
    entry < t_true visited by the lane's tile,
  - implied cleanup fraction (uncovered rays) per R.

Run BEFORE burning chip time (sim_early_exit.py precedent).

Usage: [SCENE=ite-orb.xml] [RES=192] [ROUNDS=4] python scripts/sim_majority.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

LANE_B = 128


def entered(cl_lo, cl_hi, o, d, far):
    """(N, C) bool entered + (N, C) entry distance (f64 numpy slab)."""
    import numpy as np
    o = np.asarray(o, np.float64)[:, None, :]
    d = np.asarray(d, np.float64)[:, None, :]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t1 = (cl_lo[None] - o) * inv
    t2 = (cl_hi[None] - o) * inv
    tn = np.minimum(t1, t2).max(-1)
    tf = np.maximum(t1, t2).min(-1)
    ent = np.maximum(tn, 0.0)
    hit = (tf >= ent) & (tn < far[:, None])
    return hit, np.where(hit, ent, np.inf)


def simulate(name, cl_lo, cl_hi, o, d, far, t_true, rounds):
    import numpy as np
    N = o.shape[0]
    hit, ent = entered(cl_lo, cl_hi, o, d, far)
    # needed entries: entry strictly below the true closest t (anything
    # at or past t_true cannot contain a closer hit)
    # entry <= t (inclusive + ulp slack): the WINNING cluster itself can
    # have entry == t_true (axis-aligned wall prims lie on the box face)
    needed = hit & (ent <= t_true[:, None] * (1 + 1e-6) + 1e-9)
    n_needed = needed.sum(1)
    print(f"[{name}] N={N} needed clusters/ray: mean {n_needed.mean():.2f} "
          f"p99 {np.percentile(n_needed, 99):.0f} max {n_needed.max()}")

    # first entered cluster = sort key (dead lanes last)
    first = np.where(hit.any(1), np.argmin(ent, axis=1), cl_lo.shape[0])
    octant = (d[:, 0] > 0) + 2 * (d[:, 1] > 0) + 4 * (d[:, 2] > 0)
    order = np.lexsort((octant, first))
    ent_s = ent[order]
    needed_s = needed[order]
    t_s = t_true[order]
    Np = -(-N // LANE_B) * LANE_B
    pad = Np - N
    if pad:
        ent_s = np.pad(ent_s, ((0, pad), (0, 0)), constant_values=np.inf)
        needed_s = np.pad(needed_s, ((0, pad), (0, 0)))
        t_s = np.pad(t_s, (0, pad))
    nt = Np // LANE_B

    resort = os.environ.get("RESORT", "1") != "0"
    # median-lane pick: with lanes sorted by pending candidate, the
    # tile's choice is its middle lane's id — no in-kernel mode needed
    median = os.environ.get("MEDIAN", "1") != "0"
    visited = np.zeros_like(needed_s)           # (Np, C) visited-by-my-tile
    kvisits = 0
    for r in range(rounds):
        pend = needed_s & ~visited
        # each lane's front-most pending candidate
        pend_ent = np.where(pend, ent_s, np.inf)
        cand = np.where(pend.any(1), np.argmin(pend_ent, axis=1), -1)
        if resort and r > 0:
            # production analog: one multi-operand wavefront sort per
            # round packs pending lanes by their next candidate
            rorder = np.lexsort((np.arange(len(cand)),
                                 np.where(cand >= 0, cand, 1 << 30)))
            ent_s = ent_s[rorder]
            needed_s = needed_s[rorder]
            visited = visited[rorder]
            pend = needed_s & ~visited
            pend_ent = np.where(pend, ent_s, np.inf)
            cand = np.where(pend.any(1), np.argmin(pend_ent, axis=1), -1)
        ct = cand.reshape(nt, LANE_B)
        share = np.zeros(nt)
        pick = np.full(nt, -1)
        if median:
            mid = ct[:, LANE_B // 2].copy()
            for tix in range(nt):
                valid = ct[tix] >= 0
                if valid.any():
                    pick[tix] = mid[tix] if mid[tix] >= 0 \
                        else ct[tix][valid][len(ct[tix][valid]) // 2]
                    share[tix] = (ct[tix] == pick[tix]).sum() \
                        / max(valid.sum(), 1)
        else:
            for tix in range(nt):
                vals, cnts = np.unique(ct[tix][ct[tix] >= 0],
                                       return_counts=True)
                if len(vals):
                    pick[tix] = vals[np.argmax(cnts)]
                    share[tix] = cnts.max() / max((ct[tix] >= 0).sum(), 1)
        act = pick >= 0
        kvisits += int(act.sum())
        # the visit covers EVERY lane of the tile for that cluster
        visited.reshape(nt, LANE_B, -1)[
            np.arange(nt)[act], :, pick[act]] = True
        cov = (needed_s & ~visited).sum(1) == 0
        print(f"  round {r}: active tiles {act.mean()*100:5.1f}%  "
              f"pick share {share[act].mean()*100:5.1f}%  "
              f"rays covered {cov.mean()*100:5.1f}%")
    uncov = (needed_s & ~visited).any(1)
    print(f"  after {rounds} rounds: cleanup rays {uncov.mean()*100:.1f}% "
          f"(needed-left mean "
          f"{(needed_s & ~visited).sum(1)[uncov].mean() if uncov.any() else 0:.2f}); "
          f"tile-visits {kvisits} = {kvisits/nt:.2f}/tile "
          f"(union sweep: ~9.7/tile)")


def main():
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.base import camera_rays
    from adapt_tpu.ops.intersect import ray_intersect, FAR
    from adapt_tpu.ops.math3d import delocalize_rotate

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    res = int(os.environ.get("RES", "192"))
    rounds = int(os.environ.get("ROUNDS", "4"))
    cfg = dataclasses.replace(cfg, w=res, h=res,
                              focal=cfg.focal * res / min(cfg.w, cfg.h),
                              start_x=0, end_x=res, start_y=0, end_y=res)
    cl_lo = np.asarray(scene.cl_aabb[:, 0:3], np.float64)
    cl_hi = np.asarray(scene.cl_aabb[:, 3:6], np.float64)
    cfg_cpu = dataclasses.replace(cfg, use_cluster=False, use_pallas=False)

    key = jax.random.PRNGKey(0)
    ro, rd = camera_rays(scene, cfg, key, jnp.int32(0))
    N = ro.shape[0]
    far = np.full((N,), FAR, np.float32)

    it = ray_intersect(scene, cfg_cpu, ro, rd)
    t_cam = np.asarray(it.t)
    t_cam = np.where(np.asarray(it.obj_id) >= 0, t_cam, FAR)
    simulate("camera", cl_lo, cl_hi, np.asarray(ro), np.asarray(rd),
             far, t_cam, rounds)

    # one realistic diffuse bounce off the camera hits
    hitm = np.asarray(it.obj_id) >= 0
    hp = np.asarray(ro) + np.asarray(rd) * t_cam[:, None]
    n = np.asarray(it.n_g)
    u = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    cos_t = jnp.sqrt(1.0 - u[:, 0])
    sin_t = jnp.sqrt(u[:, 0])
    phi = 2.0 * jnp.pi * u[:, 1]
    local = jnp.stack([sin_t * jnp.cos(phi), cos_t,
                       sin_t * jnp.sin(phi)], -1)   # y-up local frame
    d2 = np.asarray(delocalize_rotate(jnp.asarray(n), local))
    o2 = hp + 1e-4 * d2
    o2, d2 = o2[hitm], d2[hitm]
    it2 = ray_intersect(scene, cfg_cpu, jnp.asarray(o2, jnp.float32),
                        jnp.asarray(d2, jnp.float32))
    t_b = np.asarray(it2.t)
    t_b = np.where(np.asarray(it2.obj_id) >= 0, t_b, FAR)
    simulate("bounce1", cl_lo, cl_hi, o2, d2,
             np.full((o2.shape[0],), FAR, np.float32), t_b, rounds)


if __name__ == "__main__":
    main()
