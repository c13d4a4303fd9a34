#!/usr/bin/env python
"""Ablate per-visit costs inside the shortlist cluster kernel (timing only;
most variants return wrong results by construction). Bounce-closest is the
dominant full-render case, so only it is timed."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    import numpy as np
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    key = jax.random.PRNGKey(0)
    N = 512 * 512
    k1, k2 = jax.random.split(key)
    if os.environ.get("REAL_BOUNCE", "1") != "0":
        # realistic bounce rays: origins on scene surfaces (camera hit
        # points), cosine-ish random continuation directions — random
        # box-interior rays over-weight empty space and mislead (the
        # full-render profile showed a very different cost mix)
        from adapt_tpu.renderer.base import camera_rays
        ro, rd = camera_rays(scene, cfg, k1, jnp.int32(0))
        it = ray_intersect(scene, cfg, ro, rd)
        hit_p = ro + it.t[:, None] * rd
        d2 = jax.random.normal(k2, (N, 3))
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        flip = jnp.sum(d2 * it.n_g, axis=-1) < 0.0
        d2 = jnp.where(flip[:, None], -d2, d2)
        o2 = jnp.where(it.is_hit[:, None], hit_p, ro)
    else:
        lo = jnp.min(scene.obj_aabb_min, axis=0)
        hi = jnp.max(scene.obj_aabb_max, axis=0)
        o2 = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
        d2 = jax.random.normal(k2, (N, 3))
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    o2, d2 = jax.block_until_ready((o2, d2))

    def timed(fn, reps=7):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # slab_only / no_chunk_gate retired with the gateless visit redesign
    # (no chunk slabs left to ablate)
    variants = [set(), {"sweep_only"}, {"no_dma"}]
    for v in variants:
        cp._ABLATE = v
        fn = jax.jit(lambda o, d, _v=tuple(sorted(v)):
                     ray_intersect(scene, cfg, o, d).t)
        np.asarray(fn(o2, d2))
        t = timed(lambda: fn(o2, d2))
        print(f"{sorted(v) or ['base']}: bounce closest {t*1e3:7.1f} ms",
              flush=True)
    cp._ABLATE = set()

if __name__ == "__main__":
    main()
