#!/usr/bin/env python
"""Size BDPT t=1 film-splat strategies on the real chip.

The xprof profile (2026-08-19) shows scatter-add as the top BDPT op:
25.3 ms/pass = 6 separate 262k-update scatters into the (P,3) film (one
per t=1 strategy in the scan). Variants timed here, each amortized in a
device-side scan so tunnel dispatch overhead (~30 ms) cancels:
  a) 6 separate scatters (current shape)
  b) one concatenated 6*N scatter
  c) one concatenated scatter, stream pre-sorted by pixel +
     indices_are_sorted hint
  d) sort-based (no scatter): film markers + splats sorted by pixel,
     run totals via cumsum minus run-base (associative max scan),
     unsorted by a second sort -> dense add. Float note: run totals
     come from differences of global prefix sums (f32), so this trades
     exactness for speed - only worth wiring if much faster.
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

P = 512 * 512
K = 6
N = P
R = 8        # device-side reps per dispatch


def timed(fn, *args, reps=5):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / R


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # ~35% valid splats (visibility-pass survivors), rest dropped
    idx = jnp.where(jax.random.uniform(k1, (K, N)) < 0.35,
                    jax.random.randint(k2, (K, N), 0, P), P)
    rgb = jax.random.uniform(k3, (K, N, 3))

    def loop(body):
        def run(film, idx, rgb):
            def step(f, r):
                return body(f, idx, rgb) + r, ()
            f, _ = jax.lax.scan(step, film,
                                jnp.arange(R, dtype=jnp.float32)
                                .reshape(R, 1, 1) * 0.0)
            return f
        return jax.jit(run)

    def sep(film, idx, rgb):
        for k in range(K):
            film = film.at[idx[k]].add(rgb[k], mode="drop")
        return film

    def cat(film, idx, rgb):
        return film.at[idx.reshape(-1)].add(rgb.reshape(-1, 3),
                                            mode="drop")

    def cat_sorted(film, idx, rgb):
        ii = idx.reshape(-1)
        rr = rgb.reshape(-1, 3)
        ii, r0, r1, r2 = jax.lax.sort(
            [ii, rr[:, 0], rr[:, 1], rr[:, 2]], num_keys=1)
        rr = jnp.stack([r0, r1, r2], -1)
        d = jax.lax.scatter_add(
            film, ii[:, None], rr,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,)),
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        return d

    def sortsum(film, idx, rgb):
        M = K * N
        ii = idx.reshape(-1)
        rr = rgb.reshape(-1, 3)
        keys = jnp.concatenate([2 * jnp.arange(P, dtype=jnp.int32) + 1,
                                jnp.where(ii < P, 2 * ii,
                                          jnp.int32(2 * P + 2))])
        pos = jnp.arange(P + M, dtype=jnp.int32)
        v = jnp.concatenate([jnp.zeros((P, 3), jnp.float32), rr], 0)
        ks, v0, v1, v2, ps = jax.lax.sort(
            [keys, v[:, 0], v[:, 1], v[:, 2], pos], num_keys=1)
        vs = jnp.stack([v0, v1, v2], -1)
        c = jnp.cumsum(vs, axis=0)
        pix = ks >> 1
        newrun = jnp.concatenate(
            [jnp.ones((1,), bool), pix[1:] != pix[:-1]])
        cprev = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), c[:-1]])
        base = jnp.where(newrun[:, None], cprev, -jnp.inf)
        m = jax.lax.associative_scan(jnp.maximum, base, axis=0)
        tot = c - m
        _, t0, t1, t2 = jax.lax.sort(
            [ps, tot[:, 0], tot[:, 1], tot[:, 2]], num_keys=1)
        return film + jnp.stack([t0, t1, t2], -1)[:P]

    def tile_kernel(film, idx, rgb):
        from adapt_tpu.ops.splat_pallas import splat_sorted_accumulate
        ii = idx.reshape(-1)
        rr = rgb.reshape(-1, 3)
        ii, r0, r1, r2 = jax.lax.sort(
            [ii, rr[:, 0], rr[:, 1], rr[:, 2]], num_keys=1)
        return splat_sorted_accumulate(film, ii, r0, r1, r2)

    film = jnp.zeros((P, 3), jnp.float32)
    fns = {"a_sep6": sep, "b_cat": cat, "c_cat_sorted": cat_sorted,
           "d_sortsum": sortsum, "e_tile_kernel": tile_kernel}
    outs = {}
    for name, f in fns.items():
        fn = loop(f)
        dt = timed(fn, film, idx, rgb)
        outs[name] = np.asarray(fn(film, idx, rgb))
        print(f"{name:14s}: {dt*1e3:7.2f} ms", flush=True)
    ref = outs["a_sep6"] * 0 + np.asarray(
        loop(sep)(film, idx, rgb))
    for name, o in outs.items():
        err = np.max(np.abs(o - ref)) / max(np.max(np.abs(ref)), 1e-9)
        print(f"{name:14s}: max rel err vs sep6 = {err:.2e}")


if __name__ == "__main__":
    main()
