"""Benchmark: wavefront PT throughput on cornell-box 512^2 (BASELINE.json).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Runs on the real TPU chip when available (default JAX platform); baseline is
the driver's north-star target of 100 Mrays/s on 1x TPU v5e.

Ray accounting: every pass casts, per pixel, 1 primary ray, num_shadow_ray
shadow rays per bounce, and max_bounce-1 continuation rays (the LAST
bounce's continuation intersect is skipped — its hit would feed nothing).
The wavefront executes all lanes each bounce, so this is also the true
computational ray count: count only rays actually cast.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 100.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.pt import render_batch_pt

    here = os.path.dirname(os.path.abspath(__file__))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               "cbox.xml")
    cfg = dataclasses.replace(cfg, max_bounce=8)

    key = jax.random.PRNGKey(0)
    iters = int(os.environ.get("BENCH_ITERS", "64"))
    # fuse=1 measured fastest on the r3 lean bounce carry (424.1 vs 396.8
    # at fuse=2 / 338.4 at fuse=4 / 340.7 at fuse=8, honest Mrays/s,
    # 2026-08-19): with per-fusion launch overhead gone, the narrower
    # wavefront's smaller HBM fusion temps win. Re-sweep after carry
    # changes.
    fuse = int(os.environ.get("BENCH_FUSE", "1"))
    out = render_batch_pt(scene, cfg, key, jnp.int32(1), iters, fuse)
    jax.block_until_ready(out)

    # the axon tunnel adds heavy per-call jitter: time each rep separately
    # and take the median of 5 (single 3-rep means varied by >25%)
    reps = int(os.environ.get("BENCH_REPS", "5"))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = render_batch_pt(scene, cfg, jax.random.fold_in(key, r + 1),
                              jnp.int32(iters + 1), iters, fuse)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    rays_per_pass = cfg.n_pixels * (
        1 + cfg.max_bounce * cfg.num_shadow_ray + (cfg.max_bounce - 1))
    mrays = rays_per_pass * iters / dt / 1e6
    print(json.dumps({
        "metric": "pt_cbox512_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    # the axon tunnel occasionally drops a single call mid-run; retry the
    # whole measurement a couple of times before giving up (compiles are
    # cached, so a retry after warmup is cheap)
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:                      # pragma: no cover
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed ({e!r}); retrying",
                  file=sys.stderr)
            time.sleep(20)
