#!/usr/bin/env python
"""Time the pieces of a cluster-tier intersect call in isolation:
key slab pass, wavefront sort, shortlist build, kernel. Identifies
whether the outside-kernel dense passes are worth optimizing."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, reps=5):
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
    import numpy as np
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.ops.intersect import _sort_by, FAR
    from adapt_tpu.ops import cluster_pallas as cp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    C = scene.cl_aabb.shape[0]
    print(f"C={C} CM={scene.cl_rows.shape[2]} LANE_B={cp.LANE_B}",
          flush=True)
    key = jax.random.PRNGKey(0)
    N = 512 * 512
    k1, k2 = jax.random.split(key)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    o = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    far = jnp.full((N,), FAR, jnp.float32)

    ckey = jax.jit(lambda o, d, f: cp.primary_cluster_key(scene, o, d, f))
    sortf = jax.jit(lambda k, o, d, f: _sort_by(
        k, [o, d, f, jnp.arange(N, dtype=jnp.int32)]))

    def shortlists(o, d, f):
        ro, rd, fr, Np = cp._ray_blocks(o, d, f)
        return cp._tile_shortlists(scene.cl_aabb, ro, rd, fr)[:2]
    slf = jax.jit(shortlists)
    kern = jax.jit(lambda o, d, f: cp.cluster_closest_hit(scene, o, d, f)[0])

    kv = ckey(o, d, far)
    os_, ds_, fs_, pos = sortf(kv, o, d, far)
    np.asarray(slf(os_, ds_, fs_)[0]); np.asarray(kern(os_, ds_, fs_))
    print(f"key slab : {timed(lambda: ckey(o, d, far))*1e3:7.1f} ms",
          flush=True)
    print(f"sort     : {timed(lambda: sortf(kv, o, d, far))*1e3:7.1f} ms",
          flush=True)
    print(f"shortlist: {timed(lambda: slf(os_, ds_, fs_))*1e3:7.1f} ms",
          flush=True)
    print(f"kernel+  : {timed(lambda: kern(os_, ds_, fs_))*1e3:7.1f} ms "
          f"(includes its internal shortlist build)", flush=True)


if __name__ == "__main__":
    main()
