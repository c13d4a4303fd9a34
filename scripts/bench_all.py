#!/usr/bin/env python
"""Secondary benchmarks: VPT and BDPT ms/spp on the real chip.

bench.py stays the driver's single-line headline (PT Mrays/s); this script
tracks the other integrators for PARITY.md. Median of BENCH_REPS timed
dispatches of BENCH_ITERS spp each.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, reps):
    """Forces completion with a device->host scalar fetch —
    block_until_ready does not reliably block through the axon tunnel
    (scripts/bench_gather.py)."""
    import numpy as np
    import jax
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(r)
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
    from adapt_tpu.renderer.vpt import render_batch_vpt
    from adapt_tpu.renderer.bdpt import render_batch_bdpt

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    key = jax.random.PRNGKey(0)
    out = {}

    # VPT: bounded-medium cornell box (BASELINE config 4 family)
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "vpt"),
                               "cbox.xml")
    cfg = dataclasses.replace(cfg, max_bounce=16)
    spp, fuse = 16, 1
    f_vpt = jax.jit(lambda k: jnp.sum(render_batch_vpt(
        scene, cfg, k, jnp.int32(1), spp, fuse)))
    f_vpt(key)
    dt = timed(lambda r: f_vpt(jax.random.fold_in(key, r)), reps)
    out["vpt_cbox512_ms_per_spp"] = round(dt / spp * 1e3, 2)

    # BDPT: cornell box, 6 bounces (BASELINE config 3 family)
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               "cbox.xml")
    cfg = dataclasses.replace(cfg, max_bounce=6)
    spp = 8
    f_bdpt = jax.jit(lambda k: jnp.sum(render_batch_bdpt(
        scene, cfg, k, jnp.int32(1), spp)))
    f_bdpt(key)
    dt = timed(lambda r: f_bdpt(jax.random.fold_in(key, r)), reps)
    out["bdpt_cbox512_ms_per_spp"] = round(dt / spp * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
