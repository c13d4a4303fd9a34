#!/usr/bin/env python
"""Size the ray-queue pair-stream sort on the real chip.

The per-cluster ray-queue intersector needs (a) one multi-operand sort of
the K*N pair stream by cluster id (payload: ro3, rd3, far, stream pos) and
(b) one 3-operand unsort of the kernel outputs. This times lax.sort at the
candidate stream sizes so K can be chosen with data.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/adapt_tpu_jax"))


def timed(fn, *args, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    key = jax.random.PRNGKey(0)
    for M in (1 << 18, 1 << 19, 1 << 20, 1 << 21):
        k1, k2 = jax.random.split(jax.random.fold_in(key, M))
        cl = jax.random.randint(k1, (M,), 0, 416)
        pay = jax.random.normal(k2, (8, M))

        def sort8(cl, pay):
            ops = [cl] + [pay[i] for i in range(8)]
            return jax.lax.sort(ops, num_keys=1)[0]

        def sort3(cl, pay):
            ops = [cl] + [pay[i] for i in range(2)]
            return jax.lax.sort(ops, num_keys=1)[0]

        f8 = jax.jit(sort8)
        f3 = jax.jit(sort3)
        np.asarray(f8(cl, pay)); np.asarray(f3(cl, pay))
        t8 = timed(f8, cl, pay)
        t3 = timed(f3, cl, pay)
        print(f"M={M:8d}: sort 1key+8pay {t8*1e3:7.2f} ms   "
              f"1key+2pay {t3*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
