#!/usr/bin/env python
"""Calibrate per-dispatch overhead vs true device cost through the axon
tunnel: times a trivial op, then lax.sort at wavefront sizes both as one
dispatch and amortized inside a device-side scan loop (the difference is
the per-call overhead every small microbench here has been paying)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/adapt_tpu_jax"))


def timed(fn, *args, reps=7):
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
    triv = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8, 128))
    np.asarray(triv(x))
    print(f"trivial dispatch: {timed(triv, x)*1e3:7.2f} ms", flush=True)

    R = 10
    for M in (1 << 18, 1 << 21):
        k1, k2 = jax.random.split(jax.random.fold_in(key, M))
        cl = jax.random.randint(k1, (M,), 0, 3320)
        pay = jax.random.normal(k2, (8, M))

        def sort_once(cl, pay):
            return jax.lax.sort([cl] + [pay[i] for i in range(8)],
                                num_keys=1)[0]

        def sort_loop(cl, pay):
            def body(c, _):
                out = jax.lax.sort([c] + [pay[i] for i in range(8)],
                                   num_keys=1)[0]
                # perturb so the compiler can't hoist the sort
                return out + 1, out[0]
            c, outs = jax.lax.scan(body, cl, None, length=R)
            return outs

        f1 = jax.jit(sort_once)
        fR = jax.jit(sort_loop)
        np.asarray(f1(cl, pay)); np.asarray(fR(cl, pay))
        t1 = timed(f1, cl, pay)
        tR = timed(fR, cl, pay)
        print(f"M={M:8d}: sort once {t1*1e3:7.2f} ms   "
              f"x{R} loop {tR*1e3:7.2f} ms -> {tR/R*1e3:7.2f} ms/sort",
              flush=True)


if __name__ == "__main__":
    main()
