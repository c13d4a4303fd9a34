#!/usr/bin/env python
"""Time intersect_pair vs separate does_intersect + ray_intersect on
identical bounce-like inputs (cluster tier, real chip). Isolates the
fused-call regression seen in full renders from renderer-loop effects."""
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
    from adapt_tpu.ops.intersect import (ray_intersect, does_intersect,
                                         intersect_pair)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    key = jax.random.PRNGKey(0)
    N = 512 * 512
    k1, k2, k3 = jax.random.split(key, 3)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    o = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # shadow dirs toward a fixed ceiling point (light-like)
    tgt = (lo + hi) * 0.5 + jnp.array([0.0, 0.0, 0.0]) \
        + (hi - lo) * jnp.array([0.0, 0.0, 0.45])
    to_l = tgt[None, :] - o
    sd = to_l / jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    sfar = jnp.linalg.norm(to_l, axis=-1)
    alive = jax.random.uniform(k3, (N,)) < 0.8

    sep = jax.jit(lambda: (does_intersect(scene, cfg, o, sd, sfar,
                                          alive=alive),
                           ray_intersect(scene, cfg, o, d, alive=alive).t))
    pair = jax.jit(lambda: (lambda r: (r[0], r[1].t))(
        intersect_pair(scene, cfg, o, sd, sfar, d, alive=alive)))
    np.asarray(sep()[1]); np.asarray(pair()[1])
    ts = timed(sep)
    tp = timed(pair)
    print(f"separate: {ts*1e3:8.1f} ms   fused pair: {tp*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
