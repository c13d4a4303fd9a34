#!/usr/bin/env python
"""Simulate the shortlist sweep's front-to-back early exit on CPU.

For knot290k (or SCENE=) rays, computes per-tile-group shortlists exactly
as the kernel consumes them, then replays the sweep in numpy using the
cursor walk's true hits: a lane's t_best becomes its true closest t once
the winning prim's cluster has been visited. Reports visits per tile with
and without the exit, for primary and bounce rays, at the current
LANE_B/SL_WORDS/EB_E. Pure CPU — no TPU needed; use it to pick EB_E /
G-size before burning chip time."""
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
    # prim gid -> cluster id
    gids = np.asarray(scene.cl_rows[:, 13, :]).astype(np.int64)  # (C, CM)
    P = int(np.asarray(scene.prim_ng).shape[0])
    prim2cl = np.full(P, -1, np.int64)
    for c in range(C):
        g = gids[c]
        prim2cl[g[g >= 0]] = c

    key = jax.random.PRNGKey(0)
    ro, rd = camera_rays(scene, cfg, key, jnp.int32(0))
    N = ro.shape[0]
    k1, k2 = jax.random.split(key)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    o2 = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    d2 = jax.random.normal(k2, (N, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    far0 = jnp.full((N,), FAR, jnp.float32)

    cfg_cpu = dataclasses.replace(cfg, use_cluster=False, use_pallas=False)

    for tag, o, d in [("primary", ro, rd), ("bounce", o2, d2)]:
        # the same sort the dispatch applies
        ckey = cp.primary_cluster_key(scene, o, d, far0)
        o_s, d_s, far_s = _sort_by(ckey, [o, d, far0])
        rob, rdb, farb, _ = cp._ray_blocks(o_s, d_s, far_s)
        counts, packed, eblk, G = cp._tile_shortlists(
            scene.cl_aabb, rob, rdb, farb)
        counts = np.asarray(counts)[0]
        packed = np.asarray(packed)
        eblk = np.asarray(eblk)
        S = 2 * cp.SL_WORDS

        it = ray_intersect(scene, cfg_cpu, o_s, d_s)
        t_true = np.asarray(it.t)
        hit_cl = np.where(np.asarray(it.prim_id) >= 0,
                          prim2cl[np.clip(np.asarray(it.prim_id), 0,
                                          P - 1)], -1)
        nt = rob.shape[0] // cp.LANE_B
        no_exit = exit_v = over_n = 0
        for tile in range(nt):
            g = tile // G
            cnt = counts[g]
            sl = np.empty(min(cnt, S), np.int64)
            w = packed[g]
            sl[0::2] = w[: (len(sl) + 1) // 2] & 0xffff
            sl[1::2] = (w[: len(sl) // 2] >> 16) & 0xffff
            if cnt > S:
                over_n += 1
                no_exit += C
                exit_v += C        # overflow sweeps all C (gated)
                continue
            no_exit += cnt
            lanes = slice(tile * cp.LANE_B, (tile + 1) * cp.LANE_B)
            lt = t_true[lanes] if lanes.stop <= len(t_true) \
                else np.concatenate([t_true[lanes.start:],
                                     np.full(lanes.stop - len(t_true),
                                             -3e38)])
            lc = hit_cl[lanes] if lanes.stop <= len(hit_cl) \
                else np.concatenate([hit_cl[lanes.start:],
                                     np.full(lanes.stop - len(hit_cl), -1)])
            tb = np.where(lt > 0, FAR, -3e38)     # pad lanes dead
            for j in range(cnt):
                c = sl[j]
                tb = np.where((lc == c), np.minimum(tb, lt), tb)
                nj = j + 1
                if nj % cp.EB_E == 0 and nj < cnt:
                    if eblk[g, nj // cp.EB_E] >= tb.max():
                        exit_v += nj
                        break
            else:
                exit_v += cnt
        print(f"{tag}: tiles={nt} overflow={over_n} "
              f"visits/tile no-exit={no_exit / nt:.1f} "
              f"with-exit={exit_v / nt:.1f} "
              f"({no_exit / max(exit_v, 1):.2f}x fewer)", flush=True)

        # hypothetical phase-2 lists: far tightened to the true hit t
        # (what a two-phase sweep could achieve after a capped first pass)
        far2 = jnp.asarray(np.where(t_true > 0, t_true * (1 + 1e-5),
                                    np.asarray(far_s)[:len(t_true)]),
                           jnp.float32)
        rob2, rdb2, farb2, _ = cp._ray_blocks(o_s, d_s, far2)
        c2, _, _, _ = cp._tile_shortlists(scene.cl_aabb, rob2, rdb2, farb2)
        c2 = np.asarray(c2)[0]
        per_tile = np.repeat(c2, G)[:nt]
        ov2 = int((c2 > S).sum())
        print(f"{tag}: phase2-bound lists: mean={per_tile.mean():.1f} "
              f"p90={np.percentile(per_tile, 90):.0f} "
              f"max={per_tile.max()} overflow_groups={ov2}", flush=True)


if __name__ == "__main__":
    main()
