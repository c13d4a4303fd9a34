#!/usr/bin/env python
"""Profile one PT bench dispatch on the real TPU and print top device ops.

Usage (TPU, via axon default platform):

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/profile_pt.py

Env knobs: BENCH_ITERS (spp per dispatch, default 32), BENCH_FUSE (default 4).
Traces with jax.profiler into /tmp/jaxtrace, then converts the xplane with
the xprof/tensorboard converter and prints the top rows of
'framework_op_stats' sorted by total self time.
"""
import dataclasses
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

TRACE_DIR = "/tmp/jaxtrace"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.pt import render_batch_pt

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               "cbox.xml")
    cfg = dataclasses.replace(cfg, max_bounce=8)
    iters = int(os.environ.get("BENCH_ITERS", "32"))
    fuse = int(os.environ.get("BENCH_FUSE", "4"))
    key = jax.random.PRNGKey(0)

    # warmup/compile outside the trace
    jax.block_until_ready(render_batch_pt(scene, cfg, key, jnp.int32(1),
                                          iters, fuse))
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(render_batch_pt(
            scene, cfg, jax.random.fold_in(key, 1), jnp.int32(iters + 1),
            iters, fuse))

    from xprof.convert import raw_to_tool_data as rtd
    xs = glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    lines = data.splitlines()
    # csv: rank,host/device,op type,op name,#occurrences,total time,avg,
    #      total self time (us), ...
    import csv
    rows = list(csv.reader(lines))
    head = rows[0]
    self_i = next(i for i, c in enumerate(head) if "total_self_time" in c
                  or c.strip().lower().startswith("total self"))
    dev_rows = [r for r in rows[1:] if len(r) > self_i and r[1] == "Device"]
    dev_rows.sort(key=lambda r: -float(r[self_i]))
    total = sum(float(r[self_i]) for r in dev_rows)
    print(f"{'self_us':>12}  {'%':>6}  op")
    for r in dev_rows[:30]:
        t = float(r[self_i])
        print(f"{t:12.1f}  {100 * t / total:6.2f}  {r[2]} :: {r[3][:90]}")
    print(f"device total self time: {total / 1e3:.2f} ms")


if __name__ == "__main__":
    main()
