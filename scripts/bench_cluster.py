#!/usr/bin/env python
"""Microbenchmark the big-scene cluster intersector on the real chip.

Times 512^2-ray closest-hit and any-hit passes on the 290k-tri knot, for
(a) coherent primary camera rays and (b) incoherent bounce-like rays
(random origins inside the scene AABB, random directions) — the latter is
what dominates full renders. Median of BENCH_REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, reps=5):
    """Times with a device->host scalar fetch: block_until_ready through
    the axon tunnel does not reliably block (scripts/bench_gather.py)."""
    import numpy as np
    import jax
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.base import camera_rays
    from adapt_tpu.ops.intersect import ray_intersect, does_intersect

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    print(f"clusters C={scene.cl_rows.shape[0]} CM={scene.cl_rows.shape[2]}",
          flush=True)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_rays(scene, cfg, key, jnp.int32(0))
    N = ro.shape[0]

    # incoherent bounce-like rays: origins on scene surfaces-ish, random dirs
    k1, k2 = jax.random.split(key)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    o2 = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    d2 = jax.random.normal(k2, (N, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)

    closest = jax.jit(lambda o, d: ray_intersect(scene, cfg, o, d).t)
    anyhit = jax.jit(lambda o, d: does_intersect(scene, cfg, o, d))

    for name, o, d in [("primary", ro, rd), ("bounce", o2, d2)]:
        import numpy as _np
        _np.asarray(closest(o, d))
        _np.asarray(anyhit(o, d))
        tc = timed(lambda: closest(o, d))
        ta = timed(lambda: anyhit(o, d))
        print(f"{name}: closest {tc*1e3:8.1f} ms ({N/tc/1e6:6.2f} Mray/s)  "
              f"any {ta*1e3:8.1f} ms ({N/ta/1e6:6.2f} Mray/s)", flush=True)


if __name__ == "__main__" and not os.environ.get("RENDER"):
    main()

def full_render():
    """Optional: full PT render s/spp on the big scene (RENDER=1)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.pt import render_batch_pt
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    key = jax.random.PRNGKey(0)
    spp = int(os.environ.get("SPP", "1"))
    fuse = int(os.environ.get("FUSE", "1"))
    jax.block_until_ready(render_batch_pt(scene, cfg, key, jnp.int32(1),
                                          spp, fuse))
    dt = timed(lambda: render_batch_pt(scene, cfg, key, jnp.int32(1),
                                       spp, fuse), reps=3)
    print(f"full PT render: {dt/spp:8.2f} s/spp ({cfg.max_bounce} bounces, "
          f"spp={spp} fuse={fuse})", flush=True)


if __name__ == "__main__" and os.environ.get("RENDER"):
    full_render()
