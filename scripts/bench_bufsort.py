#!/usr/bin/env python
"""Price the full BDPT vertex-buffer lane sort on chip.

BDPT length-compaction (VERDICT r4 #2) would sort lanes by realized
subpath length so each (t,s) strategy runs on a dense prefix. Every
strategy reads the (D,N) depth-major vertex buffers per lane, so the
BUFFERS must ride the sort — ~D x n_fields scalar rows. This microbench
measures that multi-operand lax.sort at the bench shape (N = 512^2,
D = 7) to decide whether the lever can pay before building it:
the whole cbox BDPT pass is ~96 ms/spp, strategies ~55 ms, and the
masked-no-op fraction compaction could reclaim is ~30% of that — if the
sort costs more than ~10 ms the design is dead on arrival.
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

    N = 512 * 512
    D = 7
    key = jax.random.PRNGKey(0)

    for label, rows in (("state-only (25 rows)", 25),
                        ("cam buffers (84 rows)", D * 12),
                        ("both buffers (168 rows)", 2 * D * 12)):
        ops = [jax.random.normal(jax.random.fold_in(key, i), (N,))
               for i in range(rows)]
        skey = jax.random.randint(jax.random.fold_in(key, 999), (N,), 0, 8)

        @jax.jit
        def srt(skey, *ops):
            out = jax.lax.sort((skey,) + ops, dimension=0, num_keys=1)
            return out[1][:: 4096].sum()

        srt(skey, *ops)
        dt = timed(lambda: srt(skey, *ops))
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
