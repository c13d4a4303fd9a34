#!/usr/bin/env python
"""Per-RAY cluster incidence stats for the cluster-major (ray-binning)
decomposition study: how many cluster AABBs does each individual ray
enter, and what is the total (ray, cluster) incidence count? Total
incidence x CM bounds the brute work of a cluster-major pass; compare
with the tile-sweep kernel's visits x LANE_B x CM."""
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
    from adapt_tpu.ops.intersect import FAR

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes",
                                            os.environ.get("SDIR", "cbox")),
                               os.environ.get("SCENE", "knot290k.xml"))
    C = scene.cl_aabb.shape[0]
    CM = scene.cl_rows.shape[2]
    print(f"C={C} CM={CM}", flush=True)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_rays(scene, cfg, key, jnp.int32(0))
    N = ro.shape[0]
    k1, k2 = jax.random.split(key)
    lo3 = jnp.min(scene.obj_aabb_min, axis=0)
    hi3 = jnp.max(scene.obj_aabb_max, axis=0)
    o2 = jax.random.uniform(k1, (N, 3)) * (hi3 - lo3) + lo3
    d2 = jax.random.normal(k2, (N, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)

    lo = scene.cl_aabb[:, 0:3]
    hi = scene.cl_aabb[:, 3:6]

    @jax.jit
    def per_ray_counts(o, d):
        def blk(args):
            o, d = args
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
            t1 = (lo[None] - o[:, None]) * inv[:, None]
            t2 = (hi[None] - o[:, None]) * inv[:, None]
            tn = jnp.max(jnp.minimum(t1, t2), -1)
            tf = jnp.min(jnp.maximum(t1, t2), -1)
            hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < FAR)
            return jnp.sum(hit, axis=1)
        B = 4096
        n = o.shape[0]
        npad = -(-n // B) * B
        o = jnp.pad(o, ((0, npad - n), (0, 0)))
        d = jnp.pad(d, ((0, npad - n), (0, 0)), constant_values=1.0)
        return jax.lax.map(blk, (o.reshape(-1, B, 3),
                                 d.reshape(-1, B, 3))).reshape(-1)[:n]

    for name, o, d in [("primary", ro, rd), ("bounce", o2, d2)]:
        c = np.asarray(per_ray_counts(o, d))
        print(f"{name}: rays={len(c)} mean={c.mean():.2f} "
              f"p50={np.percentile(c, 50):.0f} p90={np.percentile(c, 90):.0f} "
              f"p99={np.percentile(c, 99):.0f} max={c.max()} "
              f"incidences={c.sum()} brute_prims={c.sum() * CM}", flush=True)


if __name__ == "__main__":
    main()
