"""Microbenchmark: TPU cost models for the grid-volume tracking redesign.

Measures, on the real chip (device-side loops + scalar fetch, since
block_until_ready through the axon tunnel does not reliably block):
  1. per-lane HBM gather cost (the current volume_ops cost model);
  2. K sequential dependent gathers (the while_loop pattern) per-step cost;
  3. multi-operand lax.sort throughput (sort-merge gather candidate);
  4. one-hot (tgather) matmul gather from small tables (supervoxel
     majorant candidate).

Run: python scripts/bench_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
    """fn must return a scalar (or small) array; fetching it to host forces
    execution."""
    for _ in range(warmup):
        float(np.asarray(fn(*args)).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    key = jax.random.PRNGKey(0)
    C = 96 * 96 * 96                       # tornado stand-in cell count
    table1 = jax.random.uniform(key, (C,))
    table3 = jax.random.uniform(key, (C, 3))
    print(f"devices: {jax.devices()}")

    # --- 1/2: dependent sequential gathers (the tracking-loop pattern) ---
    K = 64
    for N in (1 << 18, 1 << 21):
        idx0 = jax.random.randint(key, (N,), 0, C)

        @jax.jit
        def seq_gather(t, i0):
            def body(k, carry):
                acc, i = carry
                v = t[i]
                i = (i * 1103515245 + k + (v > 0.5).astype(jnp.int32)) % C
                return acc + v, i
            acc, _ = jax.lax.fori_loop(0, K, body,
                                       (jnp.zeros((N,)), i0))
            return jnp.sum(acc)

        dt = timeit(seq_gather, table1, idx0)
        print(f"seq {K}x scalar-gather N={N:>8}: {dt*1e3:9.3f} ms "
              f"({dt/K*1e3:7.4f} ms/step, {dt/(N*K)*1e9:6.2f} ns/elt)")

        @jax.jit
        def seq_gather3(t, i0):
            def body(k, carry):
                acc, i = carry
                v = t[i]
                i = (i * 1103515245 + k
                     + (v[:, 0] > 0.5).astype(jnp.int32)) % C
                return acc + v[:, 0] + v[:, 1] + v[:, 2], i
            acc, _ = jax.lax.fori_loop(0, K, body,
                                       (jnp.zeros((N,)), i0))
            return jnp.sum(acc)

        dt = timeit(seq_gather3, table3, idx0)
        print(f"seq {K}x (.,3)-gather  N={N:>8}: {dt*1e3:9.3f} ms "
              f"({dt/K*1e3:7.4f} ms/step, {dt/(N*K)*1e9:6.2f} ns/row)")

    # one big batched gather of N*K indices at once
    for M in (1 << 22, 1 << 24):
        idx = jax.random.randint(key, (M,), 0, C)

        @jax.jit
        def big_gather(t, i):
            return jnp.sum(t[i])

        dt = timeit(big_gather, table1, idx)
        print(f"one gather M={M:>9}: {dt*1e3:9.3f} ms "
              f"({dt/M*1e9:6.2f} ns/elt)")

    # --- 3: lax.sort throughput at tracking-call sizes ---
    for M in (1 << 22, 1 << 24):
        keys = jax.random.randint(key, (M,), 0, C)
        p1 = jax.random.uniform(key, (M,))
        p2 = jnp.arange(M, dtype=jnp.int32)

        s2 = jax.jit(lambda k, a: jnp.sum(
            jax.lax.sort((k, a), num_keys=1)[1]))
        dt = timeit(s2, keys, p1)
        print(f"sort 2-op M={M:>9}: {dt*1e3:9.3f} ms "
              f"({dt/M*1e9:6.2f} ns/elt)")

        s5 = jax.jit(lambda k, a, b: jnp.sum(jax.lax.sort(
            (k, a, b, a, b), num_keys=1)[1]))
        dt = timeit(s5, keys, p1, p2)
        print(f"sort 5-op M={M:>9}: {dt*1e3:9.3f} ms "
              f"({dt/M*1e9:6.2f} ns/elt)")

    # --- 4: one-hot matmul gather from small tables, looped K times ---
    N = 1 << 18
    for Ct in (512, 2048):
        tbl = jax.random.uniform(key, (Ct,))
        idx = jax.random.randint(key, (N,), 0, Ct)

        @jax.jit
        def onehot_loop(t, i0):
            def body(k, carry):
                acc, i = carry
                oh = (i[:, None] == jnp.arange(Ct)[None, :]).astype(
                    jnp.float32)
                v = oh @ t
                i = (i * 7 + k + (v > 0.5).astype(jnp.int32)) % Ct
                return acc + v, i
            acc, _ = jax.lax.fori_loop(0, 16, body,
                                       (jnp.zeros((N,)), i0))
            return jnp.sum(acc)

        dt = timeit(onehot_loop, tbl, idx)
        print(f"one-hot x16 C={Ct:>5} N={N}: {dt*1e3:9.3f} ms "
              f"({dt/16*1e3:7.4f} ms/step)")


if __name__ == "__main__":
    main()
