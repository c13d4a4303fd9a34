"""Wavefront length-compaction shared by the bounce-loop renderers.

VERDICT r4 #2: the bounce loops run max_bounce(+budget) FULL-width
iterations even though the alive fraction decays fast (measured cbox
512^2: PT 0.93 -> 0.18 by bounce 8; VPT 0.93 -> 0.21 by iteration 8,
0.05 by 13). At each (at, div) schedule split the state is sorted once
by aliveness (ONE multi-operand lax.sort — the house permutation idiom)
and the remaining iterations run on the first N//div lanes only.

Soundness: if alive lanes exceed the narrow width, a lax.cond takes a
full-width branch instead (both are traced; only the taken one costs
time). EXACTNESS: callers draw per-lane randomness keyed by
(iteration, ORIGINAL lane id) — see `lane_uniform` — so a lane's
realized path is independent of its position and the compacted render
equals the uncompacted one lane-for-lane (tests/test_vpt_compact.py).

Requirements on the state dict: 'active' (n,) bool, 'pos' (n,) i32
(original lane ids; arange at entry), 'color' (n,3) accumulated
radiance; every other leaf (n,...)-shaped (scalars must live in the
iteration closure). The iteration body must be width-generic: derive n
from a state leaf, never from a closed-over N.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.intersect import _sort_by


def parse_schedule(s):
    """"8:4,14:16" -> ((8, 4), (14, 16)): at iteration `at`, sort alive
    lanes to a dense prefix and continue at width N/div."""
    out = []
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        at, div = part.split(":")
        out.append((int(at), int(div)))
    return tuple(out)


def derive_schedule(profile, iters, margin=0.7, max_div=64, max_splits=4):
    """Alive-fraction profile -> compaction schedule, the shipped form of
    the hand-tuned schedules (measured: knot290k "5:2,9:8" 2.56 -> 2.334
    s/spp; ite-orb "2:4,4:16,8:64" 5.47 -> 2.252; vpt default "7:2,13:8"
    59.5 -> 35.1 ms/spp).

    profile[i] = alive fraction AFTER iteration i (host floats, from a
    probe pass). A split (at, div) is taken greedily when the expected
    occupancy of the narrowed prefix profile[at-1] * div <= margin —
    under-margin keeps the lax.cond overflow branch (full-width, sound
    but wasted sort) improbable — and div at least doubles the current
    narrowing. Splits cost one multi-operand sort + a prefix re-intersect
    each, so they are capped and must each at least halve the width."""
    out = []
    cur = 1
    for at in range(1, iters):
        if len(out) >= max_splits or iters - at < 2:
            break
        frac = float(profile[at - 1])
        div = cur
        while div * 2 <= max_div and frac * div * 2 <= margin:
            div *= 2
        if div >= 2 * cur:
            out.append((at, div))
            cur = div
    return tuple(out)


def lane_uniform(it_key, pos, D):
    """(n, D) uniforms keyed by (iteration, ORIGINAL lane id) — draws do
    not depend on the lane's position in the wavefront, so compaction
    sorts cannot change any lane's realized path."""
    keys = jax.vmap(lambda p: jax.random.fold_in(it_key, p))(pos)
    return jax.vmap(lambda k: jax.random.uniform(k, (D,)))(keys)


def run_compacted(iteration, init, iters, schedule, unroll,
                  alive_log=None, reduce_fn=None, restore_fn=None):
    """Run `iters` iterations of `iteration(i, st)` with length-
    compaction splits per `schedule`; returns the final color (N, 3) in
    init's lane order.

    reduce_fn/restore_fn (optional, both or neither): split-payload
    reduction. The compile time of a global multi-operand lax.sort
    scales ~linearly in operands x N and walks off a cliff at the full
    bounce-loop state (measured on the chip: 4 ops at 262144 = 106 s,
    12 ops at 65536 = 139 s, 25 ops at 65536 > 110 s -> the full 512^2
    state sort never returned in 40 min). reduce_fn(st) -> core drops
    every recomputable leaf (carried interaction, gathered material
    rows); restore_fn(core) -> st rebuilds them at the (narrow) width —
    typically one re-intersect of the prefix, far cheaper than sorting
    12+ extra operands. Bit-exact for alive lanes (the intersect tiers
    are deterministic per lane); dead-lane differences are masked."""
    N = init["active"].shape[0]
    if (reduce_fn is None) != (restore_fn is None):
        raise ValueError("reduce_fn and restore_fn come together")

    def run_span(st, start, count):
        """count iterations from absolute index `start` at st's width.

        unroll: a fori iteration costs ~0.5 ms of pure loop overhead on
        this platform at 512^2 (scripts/bench_while.py empty-body); the
        body is traced `unroll` times per loop (compile-size bound)."""
        if count <= 0:
            return st
        u = max(1, min(unroll, count))
        base = (count // u) * u

        def unrolled(i, st):
            for j in range(u):
                st = iteration(start + i * u + j, st)
            return st

        if alive_log is not None:
            for j in range(count):            # fully static for stats
                st = iteration(start + j, st)
                alive_log.append(jnp.sum(st["active"].astype(jnp.int32)))
            return st
        st = jax.lax.fori_loop(0, count // u, unrolled, st)
        for j in range(base, count):           # static remainder
            st = iteration(start + j, st)
        return st

    def run_tail(st, start, sched):
        w = st["active"].shape[0]
        # N // d > 0: a div larger than the wavefront (tiny dryrun
        # shapes) must skip the stage, not slice to width zero
        sched = [(a, d) for (a, d) in sched
                 if start < a < iters and 0 < N // d < w]
        if not sched:
            return run_span(st, start, iters - start)["color"]
        at, div = sched[0]
        st = run_span(st, start, at - start)
        W2 = N // div
        # actives first, ascending original-lane-id within each class:
        # the composite key pos + dead*N is DISTINCT per lane, so the
        # (unstable) lax.sort permutation is deterministic. The stage's
        # ENTRY order is restored by sorting back on a per-stage local
        # rank `loc` that rides the same sort — NOT on pos: a narrowed
        # prefix is (actives ascending, then dead ascending), which is
        # not ascending-pos as a whole, so a pos-unsort at a NESTED
        # stage attributed colors to the wrong lanes (caught by the vpt
        # golden, 30.5 max pixel diff).
        w = st["active"].shape[0]
        core = reduce_fn(st) if reduce_fn is not None else st
        skey = jnp.where(st["active"], st["pos"], st["pos"] + N)
        loc = jnp.arange(w, dtype=jnp.int32)
        leaves, treedef = jax.tree_util.tree_flatten(core)
        sorted_all = _sort_by(skey, leaves + [loc], seg=0)
        core_s = jax.tree_util.tree_unflatten(treedef, sorted_all[:-1])
        loc_s = sorted_all[-1]
        n_alive = jnp.sum(st["active"].astype(jnp.int32))

        def narrow_fn(core_s):
            pre = jax.tree_util.tree_map(lambda a: a[:W2], core_s)
            if restore_fn is not None:
                pre = restore_fn(pre)
            col_pre = run_tail(pre, at, sched[1:])
            return jnp.concatenate([col_pre, core_s["color"][W2:]], 0)

        def full_fn(core_s):
            st_f = restore_fn(core_s) if restore_fn is not None else core_s
            return run_span(st_f, at, iters - at)["color"]

        col_sorted = jax.lax.cond(n_alive <= W2, narrow_fn, full_fn,
                                  core_s)
        # exact inverse of the aliveness sort: loc_s[i] is where sorted
        # slot i's lane sat at stage entry
        (col,) = _sort_by(loc_s, [col_sorted], seg=0)
        return col

    if schedule:
        return run_tail(init, 0, list(schedule))
    return run_span(init, 0, iters)["color"]
