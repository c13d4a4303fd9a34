#!/usr/bin/env python
"""Publish the VPU flop floor of the cluster-kernel brute schedule.

VERDICT r4 #1a: "visits/tile x B x CM x per-prim test flops vs the VPU's
f32 throughput" — says whether the big-scene s/spp is 5x or 1.2x above
the bound of the CURRENT visit schedule, i.e. whether work-per-visit
optimization can still pay or the schedule itself must change.

Three measurements on the real chip:
  1. VPU f32 roofline: a Pallas kernel that runs R repetitions of a
     fused mul/add chain on a (LANE_B, CM) block — the exact shape the
     brute test uses — timed over many tiles. Reports achieved GFLOP/s.
  2. Per-visit brute cost: `_single_pass` with every tile visiting one
     cluster = exactly n_tiles visits, no sweep scaffolding. Reports
     ns/visit and the implied achieved GFLOP/s of the real brute test
     (with its div, selects and winner bookkeeping).
  3. Visit counts for a realistic bounce-ray closest pass (shortlist
     counts, phase-1 cap + tightened-far phase-2 lists), knot290k and
     ite-orb. floor = visits x per-visit-floor; compared against the
     measured pass time.

Per-pair flop count (static, _prim_chunk_test tri_only=True):
  o_n/d_n: 2x5, safe_dn: 3, t: 2, u/v: 2x13, tri_ok: 8, merge: 3 = 52.
With the sphere path (pre-r5 default): +26 (quadratic) + ~3 merge = 81.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

FLOPS_TRI = 52
FLOPS_BOTH = 81


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


def vpu_roofline(B, CM, tiles=512, R=256):
    """Measured f32 elementwise throughput at the brute test's shape.

    4 independent mul-add chains expose ILP; the in-jit sum keeps the
    tunnel fetch at 4 bytes (np.asarray of a big output measures the
    tunnel, not the VPU)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        x = x_ref[:]
        a0, a1, a2, a3 = x, x + 1.0, x + 2.0, x + 3.0
        for _ in range(R):
            a0 = a0 * x + x            # 2 flops/elt each, 4 indep chains
            a1 = a1 * x + x
            a2 = a2 * x + x
            a3 = a3 * x + x
        o_ref[:] = (a0 + a1) + (a2 + a3)

    x = jnp.ones((tiles * B, CM), jnp.float32) * 1.000001

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kern,
            grid=(tiles,),
            in_specs=[pl.BlockSpec((B, CM), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, CM), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles * B, CM), jnp.float32),
        )(x)
        return jnp.sum(out[:: B, 0])   # 4-byte tunnel fetch

    run(x)                             # compile
    dt = timed(lambda: run(x))
    flops = 2.0 * 4 * R * tiles * B * CM
    return flops / dt / 1e9, dt


def per_visit_cost(scene, Np):
    """ns/visit of one real brute visit per tile (no sweep scaffolding)."""
    import jax
    import jax.numpy as jnp
    from adapt_tpu.ops import cluster_pallas as cp

    C, F, CM = scene.cl_rows.shape
    B = cp.LANE_B
    nt = Np // B
    key = jax.random.PRNGKey(1)
    lo = jnp.min(scene.obj_aabb_min, axis=0)
    hi = jnp.max(scene.obj_aabb_max, axis=0)
    k1, k2 = jax.random.split(key)
    ro = jax.random.uniform(k1, (Np, 3)) * (hi - lo) + lo
    rd = jax.random.normal(k2, (Np, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    far = jnp.full((Np, 1), 1e7, jnp.float32)
    wid0 = jnp.full((Np, 1), -1, jnp.int32)
    picks = (jnp.arange(nt, dtype=jnp.int32) % C).reshape(1, nt)

    @jax.jit
    def run(ro, rd, far, wid0):
        t, wid = cp._single_pass(scene, ro, rd, far, Np, wid0, picks)
        return jnp.sum(t[:: B, 0])     # 4-byte tunnel fetch

    run(ro, rd, far, wid0)
    dt = timed(lambda: run(ro, rd, far, wid0))
    return dt / nt * 1e9, dt, CM


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import jax.numpy as jnp
    import numpy as np
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.ops import cluster_pallas as cp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    B = cp.LANE_B

    rate, _ = vpu_roofline(B, 256)
    print(f"VPU f32 roofline at ({B},256): {rate:.0f} GFLOP/s", flush=True)
    rate512, _ = vpu_roofline(B, 512)
    print(f"VPU f32 roofline at ({B},512): {rate512:.0f} GFLOP/s",
          flush=True)

    for xml in (os.environ.get("SCENES") or "knot290k.xml,ite-orb.xml"
                ).split(","):
        scene, cfg, _ = load_scene(os.path.join(here, "scenes", "cbox"),
                                   xml)
        C, F, CM = scene.cl_rows.shape
        Np = 512 * 512
        nt = Np // B
        ns_visit, dt, CM = per_visit_cost(scene, Np)
        pair_flops_tri = B * CM * FLOPS_TRI
        pair_flops_both = B * CM * FLOPS_BOTH
        floor_tri = pair_flops_tri / (rate if CM == 256 else rate512) / 1e9
        eff = pair_flops_tri / (ns_visit * 1e-9) / 1e9
        print(f"{xml}: C={C} CM={CM} tiles={nt}")
        print(f"  one visit/tile pass: {dt*1e3:.1f} ms -> "
              f"{ns_visit:.0f} ns/visit "
              f"(pure-FMA floor {floor_tri*1e9:.0f} ns tri-only, "
              f"{pair_flops_both/(rate if CM==256 else rate512)/1e9*1e9:.0f}"
              f" ns with sphere path)")
        print(f"  achieved brute throughput {eff:.0f} GFLOP/s "
              f"({eff/(rate if CM==256 else rate512)*100:.0f}% of "
              "roofline at tri-only op count)", flush=True)


if __name__ == "__main__":
    main()
