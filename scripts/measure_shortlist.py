#!/usr/bin/env python
"""Measure per-tile cluster-shortlist lengths for the shortlist-sweep design.

For each LANE_B-ray tile (after the coherence sort ray_intersect applies),
count how many cluster AABBs any ray in the tile enters before its far0.
This sizes the SMEM shortlist table and predicts the sweep-step count
(current kernel sweeps all C clusters per tile)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.base import camera_rays
    from adapt_tpu.ops.intersect import _sort_by, FAR
    from adapt_tpu.ops.cluster_pallas import LANE_B, primary_cluster_key

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sdir = os.environ.get("SDIR", "cbox")
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", sdir),
                               os.environ.get("SCENE", "knot290k.xml"))
    C = scene.cl_aabb.shape[0]
    print(f"C={C} CM={scene.cl_rows.shape[2]}", flush=True)
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

    @jax.jit
    def tile_counts(ro, rd, far0):
        ckey = primary_cluster_key(scene, ro, rd, far0)
        ro, rd, far = _sort_by(ckey, [ro, rd, far0])
        n = ro.shape[0]
        npad = -(-n // LANE_B) * LANE_B
        ro = jnp.pad(ro, ((0, npad - n), (0, 0)))
        rd = jnp.pad(rd, ((0, npad - n), (0, 0)), constant_values=1.0)
        far = jnp.pad(far, ((0, npad - n),), constant_values=-3e38)
        nt = npad // LANE_B
        ro = ro.reshape(nt, LANE_B, 3)
        rd = rd.reshape(nt, LANE_B, 3)
        far = far.reshape(nt, LANE_B, 1)
        lo = scene.cl_aabb[:, 0:3]
        hi = scene.cl_aabb[:, 3:6]

        def per_tile(args):
            o, d, f = args
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
            t1 = (lo[None] - o[:, None]) * inv[:, None]   # (B,C,3)
            t2 = (hi[None] - o[:, None]) * inv[:, None]
            tn = jnp.max(jnp.minimum(t1, t2), -1)
            tf = jnp.min(jnp.maximum(t1, t2), -1)
            hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < f)
            return jnp.sum(jnp.any(hit, axis=0))

        return jax.lax.map(per_tile, (ro, rd, far))

    for name, o, d in [("primary", ro, rd), ("bounce", o2, d2)]:
        c = np.asarray(tile_counts(o, d, far0))
        print(f"{name}: tiles={len(c)} mean={c.mean():.1f} "
              f"p50={np.percentile(c, 50):.0f} p90={np.percentile(c, 90):.0f} "
              f"p99={np.percentile(c, 99):.0f} max={c.max()} "
              f"total_steps={c.sum()} (full sweep {len(c) * C})", flush=True)


if __name__ == "__main__":
    main()
