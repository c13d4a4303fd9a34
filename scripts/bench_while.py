#!/usr/bin/env python
"""Measure TPU while-loop iteration overhead and per-lane gather scaling.

The rgbvol full-render profile (chain10, 2026-08-20) shows 397 tracking
while-iterations per spp whose wall cost (~840 ms) is 2.2x the device
self time (381 ms): either loop iterations carry ~1 ms of hidden
overhead on this platform, or the gather's issue latency is uncounted.
This isolates both: a no-gather loop, a 1-element-per-lane gather loop,
and a J-batched gather loop (same total elements, J x fewer iterations).

Usage: python scripts/bench_while.py  (real chip)
"""
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

    N = 32768
    ITERS = 64
    G = 96 ** 3
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (G,))
    x0 = jax.random.uniform(key, (N,))

    def loop(body, iters):
        def cond(st):
            return st[0] < iters

        def full(st):
            i, x = st
            return i + 1, body(i, x)

        return jax.lax.while_loop(cond, full, (jnp.int32(0), x0))[1]

    @jax.jit
    def nogather():
        return loop(lambda i, x: jnp.abs(x * 1.000001 + 1e-7), ITERS)

    @jax.jit
    def gather1():
        def body(i, x):
            idx = (x * (G - 1)).astype(jnp.int32)
            return jnp.abs(x * 0.5 + 0.5 * table[idx])
        return loop(body, ITERS)

    J = 4

    @jax.jit
    def gatherJ():     # same total elements, J x fewer iterations
        def body(i, x):
            idx = (x[:, None] * jnp.arange(1, J + 1) * ((G - 1) // J)) \
                .astype(jnp.int32).reshape(-1)
            vals = table[idx].reshape(N, J)
            return jnp.abs(x * 0.5 + 0.5 * vals.mean(-1))
        return loop(body, ITERS // J)

    @jax.jit
    def empty():       # loop overhead floor: body is one fused op
        return loop(lambda i, x: x + 1e-9, ITERS)

    for name, f in [("empty64", empty), ("nogather64", nogather),
                    ("gather1x64", gather1), (f"gather{J}x{ITERS//J}",
                                              gatherJ)]:
        jax.block_until_ready(f())
        dt = timed(f)
        print(f"{name:14s}: {dt*1e3:8.2f} ms  "
              f"({dt*1e3/ITERS:6.3f} ms/logical-iter)", flush=True)


if __name__ == "__main__":
    main()
