#!/usr/bin/env python
"""Attribute the queue-intersector pieces on the real chip.

Times, on knot290k bounce-like rays at 512^2:
  topk      the dense per-ray top-K candidate pass
  sort12    the 12-operand wavefront sort (queue) vs sort9 (baseline)
  lists     one _round_lists synthesis
  round r   each gated kernel round (after sort, t tightening)
  cleanup   the more-lanes tile-union pass
  baseline  the current two-phase shortlist closest (sorted by its key)
Run: python scripts/bench_queue.py  [SCENE=..., BENCH_REPS=...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


R_INNER = int(os.environ.get("R_INNER", "8"))


def timed_loop(make_fn, reps=3):
    """Time one op amortized over R_INNER in-jit iterations.

    make_fn(i) -> scalar-reducible output, where i is a traced i32 the
    caller folds into its inputs (prevents CSE across iterations). The
    axon tunnel adds ~60-70 ms of fixed overhead per dispatch+fetch
    (measured: a 3-operand unsort 'cost' 70 ms standalone while whole
    renders average 206 ms/bounce); an in-jit fori_loop amortizes it."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def body(i, acc):
            out = make_fn(i)
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.float32(0)
            for l in leaves:
                a = jnp.asarray(l)
                s = s + jnp.sum(a.ravel()[:1].astype(jnp.float32))
            return acc + s
        return jax.lax.fori_loop(0, R_INNER, body, jnp.float32(0))

    float(np.asarray(run()))            # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(run()))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / R_INNER


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    import numpy as np
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.ops.intersect import _sort_by, FAR
    from adapt_tpu.ops import cluster_pallas as cp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                               os.environ.get("SCENE", "knot290k.xml"))
    C = scene.cl_aabb.shape[0]
    K = cp.QUEUE_K
    print(f"C={C} CM={scene.cl_rows.shape[2]} K={K}", flush=True)
    key = jax.random.PRNGKey(0)
    N = 512 * 512
    k1, k2 = jax.random.split(key)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    o = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    far = jnp.full((N,), FAR, jnp.float32)
    pos0 = jnp.arange(N, dtype=jnp.int32)

    # --- piece 1: topk dense pass ---
    topk = jax.jit(lambda o, d, f: cp._topk_candidates(scene, o, d, f, K))
    ids, _ents, more = topk(o, d, far)
    print(f"candidate count stats: K-th valid "
          f"{float((np.asarray(ids) < C).mean(0)[K-1])*100:.1f}%  "
          f"more>{K}: {float(np.asarray(more).mean())*100:.2f}%", flush=True)
    t_topk = timed_loop(lambda i: topk(o + 1e-6 * i, d, far))

    # --- piece 2: sorts ---
    octant = ((d[:, 0] > 0).astype(jnp.int32) + 2 * (d[:, 1] > 0)
              .astype(jnp.int32) + 4 * (d[:, 2] > 0).astype(jnp.int32))
    qkey = jnp.where(ids[:, 0] < C, ids[:, 0] * 8 + octant, 8 * C)
    pk = cp._pack_ids(ids)
    t_s12 = timed_loop(lambda i: _sort_by(
        qkey + i, [o, d, far, pk, more.astype(jnp.int32), pos0]))
    t_s9 = timed_loop(lambda i: _sort_by(qkey + i, [o, d, far, pos0]))
    t_su3 = timed_loop(lambda i: _sort_by(pos0 + i, [far, pos0]))

    o_s, d_s, far_s, pk_s, more_s, pos_s = jax.jit(lambda: _sort_by(
        qkey, [o, d, far, pk, more.astype(jnp.int32), pos0]))()
    Np = -(-N // cp.LANE_B) * cp.LANE_B

    # --- piece 3: one _round_lists synthesis ---
    cand0 = cp._unpack_id(jnp.pad(pk_s, ((0, Np - N), (0, 0)),
                                  constant_values=int(C | (C << 16))), 0)
    rl = jax.jit(lambda c: cp._round_lists(c, Np, C))
    t_lists = timed_loop(lambda i: rl(jnp.minimum(cand0 + i, C)))
    cnts = np.asarray(rl(cand0)[0])
    print(f"round-0 per-group distinct candidates: mean {cnts.mean():.2f} "
          f"p99 {np.percentile(cnts, 99):.0f} max {cnts.max()}", flush=True)

    # --- piece 4: the full queue pass and per-round deltas ---
    def queue_k(kk):
        return lambda i: cp.queue_closest_raw(
            scene, o_s + 1e-6 * i, d_s, far_s, pk_s,
            more_s.astype(bool), kk)[0]

    # full baseline two-phase (on the same sorted rays, as in prod)
    t_base = timed_loop(lambda i: cp.cluster_closest_raw(
        scene, o_s + 1e-6 * i, d_s, far_s)[0])

    prev = None
    for kk in range(1, K + 1):
        t_k = timed_loop(queue_k(kk))
        dr = "" if prev is None else f"  (+{(t_k - prev)*1e3:6.1f} ms)"
        print(f"queue K={kk}: {t_k*1e3:8.1f} ms{dr}", flush=True)
        prev = t_k

    # majority rounds (recorded dead end — BQ_MAJ=1 to re-measure)
    if os.environ.get("BQ_MAJ", "0") != "0":
        for rr in (1, 2, 3):
            t_m = timed_loop(lambda i, rr=rr: cp.majority_closest(
                scene, o + 1e-6 * i, d, far, R=rr)[0])
            print(f"majority R={rr}: {t_m*1e3:8.1f} ms (incl topk+sorts)",
                  flush=True)

    # queue-pick (self-contained: Pallas front pass + sort + P pick
    # passes + union cleanup), plus the front pass alone
    if os.environ.get("BQ_QPICK", "1") != "0":
        t_f = timed_loop(lambda i: cp._front_candidates(
            scene, o + 1e-6 * i, d, far)[0])
        print(f"front pass (Pallas): {t_f*1e3:8.1f} ms", flush=True)
        for pp in (1, 2, 3):
            t_q = timed_loop(lambda i, pp=pp: cp.qpick_closest(
                scene, o + 1e-6 * i, d, far, P=pp)[0])
            print(f"qpick P={pp}: {t_q*1e3:8.1f} ms (incl front+sorts)",
                  flush=True)
        t_qa = timed_loop(lambda i: cp.qpick_any(scene, o + 1e-6 * i, d,
                                                 far))
        print(f"qpick any: {t_qa*1e3:8.1f} ms (incl front+sorts)",
              flush=True)

    # any-hit baseline (shadow rays), honestly timed
    t_any = timed_loop(lambda i: cp.cluster_any_hit(
        scene, o_s + 1e-6 * i, d_s, far_s))
    print(f"anyhit baseline (sorted rays): {t_any*1e3:8.1f} ms", flush=True)
    print(f"topk    {t_topk*1e3:8.1f} ms", flush=True)
    print(f"sort12  {t_s12*1e3:8.1f} ms   sort9 {t_s9*1e3:8.1f} ms   "
          f"unsort3 {t_su3*1e3:8.1f} ms", flush=True)
    print(f"lists   {t_lists*1e3:8.1f} ms", flush=True)
    print(f"baseline two-phase closest (sorted rays): {t_base*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
