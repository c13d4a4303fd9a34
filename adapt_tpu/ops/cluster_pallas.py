"""Pallas two-level cluster intersector for big scenes (TPU).

Why: the jnp cursor BVH walk does per-lane gathers from HBM node/prim
tables every step; on a 290k-prim scene those gathers measure ~100x off
HBM bandwidth on v5e (one 512^2 primary intersect = seconds). TPUs want
dense, predictable DMA + VMEM compute, so the tree is cut at scene-compile
time into C disjoint subtree clusters of <= CM prims (scene/compile.py
`_cluster_cut`), each a contiguous padded block.

The kernel grid is (ray_tiles,): a ray tile stays VMEM-resident while an
in-kernel while_loop sweeps candidate clusters **front-to-back**.

Default path (ADAPT_SHORTLIST=1): per-tile-group cluster SHORTLISTS are
built OUTSIDE the kernel with one dense (rays, C) slab pass (per-group
any-ray hit mask + front-most entry distance), sorted front-to-back, and
delivered as packed int16 pairs via scalar prefetch (SMEM). The kernel
sweeps ONLY the listed candidates — measured knot290k: primary rays hit
a mean 7.6 / max 37 of 415 cluster boxes per 256-ray tile, bounce rays
66 / 287, so the sweep shrinks 6-55x vs all-C. Each sweep step then costs
one SMEM scalar read + one (B, K) chunk-AABB slab + one any() gate —
none of the per-step mask machinery below. The sorted order also gives
the sweep its early exit: a per-block SMEM table of listed entry
distances (eblk) lets the kernel stop once no remaining cluster can
enter before the worst lane's t_best (closest) or any unoccluded lane's
light distance (any-hit). Tiles whose list overflows S=2*SL_WORDS
entries (<=1% of bounce tiles) fall back to a chunk-gated sweep of all
C clusters in index order (exact; order only affects the pruning). SMEM budget (probed: hard 1 MB, minor dim padded
to 128 words): table rows are capped at SL_MAX_ROWS, tiles share a list
in groups of G = ceil(n_tiles / SL_MAX_ROWS).

Legacy path (ADAPT_SHORTLIST=0) sweeps all clusters per tile (per-tile-
group front-to-back order from `_tile_cluster_order` via scalar
prefetch) with two-phase per-step culling shaped for the VPU's (8,128)
vregs:
 1. A (B, Cp) slab test of the WHOLE tile against ALL cluster boxes at
    once (fields-on-sublanes table `cl_aabb_t`), reduced over lanes to a
    (1, Cp) any-ray mask in VMEM scratch, refreshed every REMASK sweep
    steps with the current per-lane t_best. Per-step culling is then one
    one-hot extract from the mask. (A per-step (B,1)-shaped slab test
    wastes 127/128 VPU lanes and measured ~1.1 us x C x tiles — it was
    the dominant cost of the whole intersect.) The sweep exits early
    once the mask goes all-zero.
 2. For mask survivors, a (B, K) slab test against the cluster's K
    per-128-prim chunk AABBs (`cl_chunk`, tight sub-subtree boxes since
    chunks are contiguous DFS runs) gates the DMA and each brute chunk.
    (The shortlist path keeps exactly this phase.)

LISTED shortlist visits are GATELESS (r2): every listed cluster's prim
block is DMA'd into VMEM scratch and brute-force tested fused (same
exact-f32 VPU plane/dual-basis test as ops/intersect_pallas.py); the
former per-chunk (B,K) slab gates + pl.when branches measured more
expensive than the brute work they skipped (ablation numbers in
_visit_cluster_deferred). OVERFLOW sweeps (all C clusters, index order)
stay chunk-gated — there almost every gate fails, so each skipped
DMA+brute block pays for hundreds of slab tests; the legacy all-cluster
sweep keeps its gates for the same reason.

Layout: prim blocks are (F=24, CM) — fields on sublanes, prims on lanes —
so DMA slices stay 128-aligned and rays ride their natural (N,3) layout
(intermediates are (B, TC); no transposes anywhere). Field rows:
  0:3 n|center   3 d|radius   4:7 U   7 cu   8:11 V   11 cv
  12 is_sphere   13 gid (-1 = padding)   14:17 n_g   17 obj

Outputs carry gid, uv, n_g and obj id straight from the rows, so the big-
scene path needs no per-lane table gathers downstream either.

Measured dead ends (do not re-attempt without new evidence; knot290k
bounce-closest baseline 515 ms):
 * W-cluster windowed sweeps (one (B,128) chunk-slab + one any() per 16
   clusters): 4.3 s with the per-cluster work statically unrolled in the
   window (register spills), 2.1 s with an inner dynamic cluster loop —
   the per-cluster/per-chunk (B,128) band-mask reductions cost more than
   the per-step scalar overhead they save. Includes the order-space
   pre-permuted chunk table variant (in-kernel W-slice concat is another
   20x on top: Mosaic lowers dynamic-offset concats through memory).
 * CM=4096 clusters: 1.9 s — loose cluster boxes defeat the
   front-to-back t_near<t_best prune; CM=2048 similar direction.
 * DMA is NOT a cost: stubbing make_async_copy out entirely changes
   nothing (nobrute 500 ms == nodma 497 ms); don't build double-buffering.
 * LANE_B=128 pre-shortlist: bounce closest improved 1.22x but the
   doubled sweeps regressed primaries/any-hits 20-45% (full render 5.24
   vs 4.42 s/spp). WITH shortlists + the cluster-id ray sort the sweep
   cost collapsed and B=128 now wins end-to-end (2.87 vs 2.91 s/spp at
   CM=256) — defaults updated; the old note kept as context.
 * REMASK=16 and G_ORDER=4: both flat within noise — neither mask
   freshness nor order granularity is the binding constraint.
 * LANE_B=256 full renders (r4): knot290k 2.519 s/spp (-5%) but
   ite-orb 9.646 (+73%) — doubled tile unions blow the 480k scene's
   shortlists into overflow sweeps. Keep B=128.
 * Smaller shortlist groups (G=1 vs the default G=4 at 512^2): simulated
   on true hit data (scripts/sim_early_exit.py) — non-overflow visit
   counts are the SAME (~44/tile for synthetic bounce rays; adjacent
   tiles share cluster sets after the cluster-id sort), while the halved
   capacity doubles overflow (92 -> 183 tiles). Don't shrink G. The
   closest-sweep early exit fires on primaries (1.1x) but ~never on
   bounce tiles: a listed cluster that survives the exit check is
   genuinely needed by some lane — the tile-granularity visit count is
   already the exactness lower bound; further cuts must come from ray
   regrouping or per-lane designs, not sweep logic.

FLOP FLOOR (r5, scripts/flop_floor.py on chip 2026-08-20, after the
tri-only specialization): measured VPU f32 roofline 894 GFLOP/s at the
(128,256) brute shape (1008 at (128,512)); tri-only brute test = 52
flops/pair -> pure-FMA floor 1.9 us/visit (2.97 us with the old
always-on sphere path). A real single-visit `_single_pass` measures
14.5 us/visit (knot, CM=256) / 21.9 (ite-orb): the brute contraction is
only ~13% of an isolated visit — DMA latency, grid-step scaffolding and
winner extraction dominate, which is the same fixed-cost wall that
killed all four per-ray-granularity designs. In the real shortlist
sweep (~13.5 listed visits/tile) the brute flops account for ~52 ms of
the measured 151 ms knot bounce-closest pass (~1/3): the schedule runs
~2.9x above its own flop floor, so work-per-visit cuts saturate at
~1.5x even if the brute test were free. MXU dot_general routing of the
six dual-basis contractions (ADAPT_MXU_DOT, HIGHEST precision) measured
3.03 vs 2.56 s/spp on knot — dead end, recorded at the knob below.

Reference behavior: tracer/path_tracer.py:338-422 (BVH dispatch contract).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

RAY_EPS = 1e-4
FAR = 1e7
ROW_F = 24             # padded field count (18 used)
# rays per tile (sublanes of the intermediates); 1024 blew the 16M VMEM
# budget (~18 live (B,TC) buffers in the prim test). ADAPT_LANE_B re-runs
# the tile-size experiment without a code edit.
LANE_B = int(os.environ.get("ADAPT_LANE_B", "128"))
TC = 128               # prims tested per inner chunk (lanes; 128-aligned)
G_ORDER = 8            # ray tiles sharing one front-to-back cluster order
REMASK = 32            # sweep steps between box-mask refreshes
# shortlist sweep (default path): packed-int16 entries per group =
# 2*SL_WORDS; table rows capped so the SMEM operand stays ~512 KB
# (probed hard limit 1 MB, minor dim padded to multiples of 128 words)
SHORTLIST = os.environ.get("ADAPT_SHORTLIST", "1") != "0"
SL_WORDS = int(os.environ.get("ADAPT_SL_WORDS", "256"))
# sweep early-exit granularity: entry-distance thresholds are kept for
# every EB_E'th listed cluster (one f32 SMEM scalar each; the minor dim
# pads to 128 words anyway, so S/EB_E = 128 is free at the defaults)
EB_E = int(os.environ.get("ADAPT_EB_E", "4"))
# row cap from the probed SMEM budget (hard 1 MB, minor dims padded to
# multiples of 128 words): the id table is max(SL_WORDS,128) words/row
# and the eblk threshold table max(2*SL_WORDS/EB_E,128) more
_SL_ROW_WORDS = max(SL_WORDS, 128) + max(2 * SL_WORDS // EB_E, 128)
SL_MAX_ROWS = max(1, (3 << 16) // _SL_ROW_WORDS)
# two-phase closest sweep (see cluster_closest_raw); PH1_CAP = phase-1
# front-to-back candidate budget
TWO_PHASE = os.environ.get("ADAPT_TWO_PHASE", "1") != "0"
# gateless LISTED visits (r2 commit d6b87ad) won an all-alive incoherent
# bounce microbench (349 -> 260 ms) but LOST full renders: bisected on-
# chip, knot290k 12-bounce went 2.29 -> 3.01 s/spp at that commit — real
# bounces arrive key-hint-sorted and far-tightened, so listed chunk
# gates fail often enough to pay for themselves. Default gated.
GATELESS = os.environ.get("ADAPT_GATELESS", "0") != "0"
PH1_CAP = int(os.environ.get("ADAPT_PH1_CAP", "4"))
# per-ray front-to-back cluster march (see cluster_closest_march):
# MARCH_ROUNDS single-candidate rounds, then an exact tile-union cleanup.
# DEFAULT OFF: it wins the all-alive incoherent bounce-closest microbench
# (knot290k 375.5 -> 190.7 ms) but LOSES full renders — knot290k
# 12-bounce 2.47 -> 2.52 s/spp, ite-orb 24-bounce 5.63 -> 7.95 s/spp —
# because real bounces arrive key-hinted and alive-masked (far cheaper
# per call than the microbench) while the march pays its fixed
# 3x dense (N, C) candidate passes + ~8 wavefront sorts per call
# regardless of how many lanes are alive.
MARCH = os.environ.get("ADAPT_MARCH", "0") != "0"
MARCH_ROUNDS = int(os.environ.get("ADAPT_MARCH_ROUNDS", "2"))
# per-ray candidate QUEUE closest hit (see queue_closest_raw): ONE dense
# pass extracts each ray's first QUEUE_K entered clusters front-to-back;
# the wavefront sorts ONCE by the first candidate; K gated kernel rounds
# sweep per-group DISTINCT r'th candidates with t_best tightening
# between rounds; rays with >K candidates finish through the exact
# tile-union pass. Fixes the march's cost structure: 1 dense pass + 1
# sort (vs 3 passes + ~8 sorts) for the same per-ray granularity.
QUEUE = os.environ.get("ADAPT_QUEUE", "0") != "0"
QUEUE_K = int(os.environ.get("ADAPT_QUEUE_K", "4"))
# MAJORITY-round closest hit (see majority_closest): rays sorted by
# their front candidate, each tile visits exactly ONE cluster per round
# (its median lane's pending candidate) — no per-entry sweep steps, no
# gates (DMA + brute are measured-free; per-entry scalar scaffolding is
# the binding cost of the union sweep). Per-lane queue pointers advance
# on (tested by my tile) | (entry >= t_best); stragglers finish through
# the exact far-tightened union pass. scripts/sim_majority.py: round 0
# covers 91%/73% (camera/bounce), 2 rounds + cleanup ≈ 1.1-1.7
# tile-visits vs the union sweep's ~9.7.
# MEASURED DEAD END (keep off): on-chip knot290k bounce-closest
# microbench (scripts/bench_queue.py) R=1/2/3 all land 147-153 ms vs
# the union baseline's 151.2 and queue K=1's 61.7 — the per-round
# wavefront re-sorts (~8 multi-operand sort passes each) eat exactly
# the sweep savings the sim predicted, same cost structure that killed
# the march. Per-ray granularity is only worth it at ONE up-front sort
# (the queue design); anything that re-sorts per round loses.
MAJ = os.environ.get("ADAPT_MAJ", "0") != "0"
MAJ_R = int(os.environ.get("ADAPT_MAJ_R", "2"))
MAJ_K = int(os.environ.get("ADAPT_MAJ_K", "4"))
# QUEUE-PICK closest hit (see qpick_closest): the per-ray-granularity
# design rebuilt around the measured fixed costs that made march/queue/
# majority end-to-end neutral. ONE Pallas front-cluster pass (cluster
# AABBs resident in VMEM — replaces the 31.6 ms XLA dense (N,C) topk
# and the per-call shortlist reductions), ONE wavefront sort, QP_P
# per-tile pick passes through the scalar-prefetch _single_pass
# primitive (1 visit/tile/pass, no SMEM list-row budget — vs
# _round_lists' G=4-tile groups sweeping a measured mean 4.0 distinct
# candidates), then the exact far-tightened union cleanup for residual
# lanes (rank >= P within the tile, or >1 entered cluster).
# Microbench (knot290k all-alive random rays, the qpick-pessimistic
# case: most lanes multi-entry so the cleanup dominates): front pass
# 7.2 ms vs 31.6 jnp topk; qpick P=1/2/3 132/130/116 ms and qpick any
# 124 vs union baselines 151 (closest) / 134 (any). Real bounce rays
# hit their front cluster 73-91% (scripts/sim_majority.py), so the
# end-to-end A/B decides the default.
# MEASURED DEAD END (keep off): end-to-end A/B on chip (2026-08-20,
# bench_all rows, ADAPT_QPICK=1): knot290k 2.705 s/spp vs 2.675 default
# (neutral — the 1.16x incoherent microbench win is diluted by the
# coherent passes qpick makes no faster), ite-orb 8.335 vs 5.621 (+48%:
# at 480k prims / CM=512 the pick passes' per-tile single-cluster DMAs
# and the doubled cleanup sweep lose badly once most tiles hold >2
# distinct front clusters). Per-ray granularity now has FOUR on-chip
# losses (march, queue, majority, qpick) with the same shape: the
# regroup/cleanup fixed costs eat the brute-work savings. Any further
# big-scene attempt must change the WORK PER VISIT (resident-prim
# layout, narrower tiles), not the visit schedule.
QPICK = os.environ.get("ADAPT_QPICK", "0") != "0"
QP_P = int(os.environ.get("ADAPT_QP_P", "2"))
# MXU experiment (VERDICT r4 #1b): route the brute test's six ray x prim
# dual-basis contractions through lax.dot_general (precision HIGHEST so
# the exactness contract holds — f32-accurate passes) instead of VPU
# mul+add chains.
# MEASURED DEAD END (keep off): knot290k 3.03 s/spp vs 2.56 tri-only
# VPU (chip 2026-08-20, bench_all row, tests green in interpret mode).
# Two causes, both structural: (a) the packed (3, 3*TC) rhs cannot even
# be built (Mosaic: lane-axis concat of sublane slices is "result/input
# offset mismatch" — unimplemented), so it takes SIX K=3 dots; (b) a
# K=3 contraction uses 3/128 of the systolic array's depth, and the
# flop floor above shows the brute test is only ~13% of a visit — even
# a FREE brute test caps the win at 1.15x, while the MXU detour adds
# VMEM<->MXU layout traffic. Confirms the repo-wide no-small-K-matmul
# rule inside Pallas kernels too.
MXU_DOT = os.environ.get("ADAPT_MXU_DOT", "0") != "0"
# max elements of one (gb, G*B, C) slab intermediate in _tile_shortlists
_SL_MAX_ELEMS = 1 << 23

_INTERPRET = False     # flipped by tests on backends without Mosaic
_ABLATE = set()        # timing experiments only (scripts/ablate_cluster.py)


def _prim_chunk_test(r, ro, rd, tri_only=False):
    """(24,TC) packed prim fields x (B,3) rays -> (t,u,v) of (B,TC).

    tri_only (static, from scene.sph_gid.shape[0]==0): big scenes are
    pure triangle meshes, yet every pair paid BOTH the ~50-flop triangle
    test AND the ~26-flop sphere quadratic (merged by is_sph selects).
    Skipping the statically-dead sphere path cuts ~1/3 of the per-visit
    brute flops — the r5 work-per-visit lever (VERDICT r4 #1)."""
    def dot3(c0, vec):
        return (vec[:, 0:1] * r[c0:c0 + 1, :]
                + vec[:, 1:2] * r[c0 + 1:c0 + 2, :]) \
            + vec[:, 2:3] * r[c0 + 2:c0 + 3, :]

    pad = r[13:14, :] < 0.0
    b = r[3:4, :]
    # triangle: plane + dual basis (same op order as intersect_pallas)
    if MXU_DOT:
        # six (B,3)x(3,TC) dots, one per field row. (A packed (3,3*TC)
        # rhs via lane-axis concat of the sublane slices does not lower:
        # Mosaic "result/input offset mismatch on non-concat dimension".)
        dn = (((1,), (0,)), ((), ()))

        def dot(c0, vec):
            return jax.lax.dot_general(
                vec, r[c0:c0 + 3, :], dn,
                precision=jax.lax.Precision.HIGHEST)

        o_n, o_u, o_v = dot(0, ro), dot(4, ro), dot(8, ro)
        d_n, d_u, d_v = dot(0, rd), dot(4, rd), dot(8, rd)
        safe_dn = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
        t_tri = (b - o_n) / safe_dn
        u = o_u + t_tri * d_u - r[7:8, :]
        v = o_v + t_tri * d_v - r[11:12, :]
    else:
        o_n = dot3(0, ro)
        d_n = dot3(0, rd)
        safe_dn = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
        t_tri = (b - o_n) / safe_dn
        u = dot3(4, ro) + t_tri * dot3(4, rd) - r[7:8, :]
        v = dot3(8, ro) + t_tri * dot3(8, rd) - r[11:12, :]
    tri_ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t_tri > RAY_EPS) \
        & (jnp.abs(d_n) >= 1e-12)
    if tri_only:
        t = jnp.where(tri_ok & jnp.logical_not(pad), t_tri, FAR)
        return t, u, v
    is_sph = r[12:13, :] > 0.5
    # sphere: quadratic on (center=r[0:3], radius=b)
    cx = r[0:1, :] - ro[:, 0:1]
    cy = r[1:2, :] - ro[:, 1:2]
    cz = r[2:3, :] - ro[:, 2:3]
    cn2 = cx * cx + cy * cy + cz * cz
    proj = cx * rd[:, 0:1] + cy * rd[:, 1:2] + cz * rd[:, 2:3]
    c2r = cn2 - proj * proj
    r2 = b * b
    cut = jnp.sqrt(jnp.maximum(r2 - c2r, 0.0))
    outside = cn2 > r2 + 1e-4
    t_sph = proj + jnp.where(outside, -cut, cut)
    sph_ok = (c2r < r2) & (t_sph > RAY_EPS)

    t = jnp.where(is_sph, jnp.where(sph_ok, t_sph, FAR),
                  jnp.where(tri_ok, t_tri, FAR))
    t = jnp.where(pad, FAR, t)
    return t, u, v


def _tri_only(scene):
    """Static no-sphere flag (trace-safe: reads only an array SHAPE).

    Big scenes are pure triangle meshes; specializing the brute test
    drops the statically-dead sphere quadratic from every visit."""
    return int(scene.sph_gid.shape[0]) == 0


def _slab_lanes(table_row, ro, inv_d, t_best):
    """Slab test of the (B,3) tile against M boxes laid out on lanes.

    table_row(k) must return the (1, M) row of field k (0:3 lo, 3:6 hi).
    Returns (B, M) bool: box hit with entry before the lane's t_best."""
    shape = (ro.shape[0], table_row(0).shape[1])
    t_near = jnp.full(shape, -jnp.inf, jnp.float32)
    t_far = jnp.full(shape, jnp.inf, jnp.float32)
    for k in range(3):
        t1 = (table_row(k) - ro[:, k:k + 1]) * inv_d[:, k:k + 1]
        t2 = (table_row(k + 3) - ro[:, k:k + 1]) * inv_d[:, k:k + 1]
        t_near = jnp.maximum(t_near, jnp.minimum(t1, t2))
        t_far = jnp.minimum(t_far, jnp.maximum(t1, t2))
    return (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_best)


def _refresh_mask(m_ref, abt_ref, ro, inv_d, t_best):
    """(1, Cp) any-lane cluster mask from a full vectorized slab pass."""
    hit = _slab_lanes(lambda k: abt_ref[k:k + 1, :], ro, inv_d, t_best)
    m_ref[0:1, :] = jnp.any(hit, axis=0, keepdims=True).astype(jnp.float32)


def _mask_at(m_ref, idx):
    """Scalar mask value for cluster idx via a one-hot lane reduction."""
    Cp = m_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Cp), 1)
    return jnp.sum(jnp.where(lane == idx, m_ref[0:1, :], 0.0))


def _chunk_hits(cab_ref, idx, K, ro, inv_d, t_best):
    """(B, K) slab test against cluster idx's K chunk AABBs."""
    cab = cab_ref[pl.ds(idx * 8, 8), :]                  # (8, K)
    return _slab_lanes(lambda k: cab[k:k + 1, :], ro, inv_d, t_best)


def _visit_cluster_closest(idx, cab_ref, rows_hbm, buf, sem, ro, rd, inv_d,
                           t_o, g_o, u_o, v_o, ng_o, ob_o, sph_o,
                           tri_only=False):
    """Chunk-gate cluster idx, DMA its prim block on a hit, brute-test."""
    K = buf.shape[1] // TC
    chm = _chunk_hits(cab_ref, idx, K, ro, inv_d, t_o[:])    # (B, K)

    @pl.when(jnp.any(chm))
    def _():
        dma = pltpu.make_async_copy(rows_hbm.at[idx], buf, sem)
        dma.start()
        dma.wait()
        for kc in range(K):               # static unroll (K = CM/128)
            ch_hit = chm[:, kc:kc + 1]

            @pl.when(jnp.any(ch_hit))
            def _(kc=kc, ch_hit=ch_hit):
                r = buf[:, kc * TC:(kc + 1) * TC]       # (24, TC)
                t, u, v = _prim_chunk_test(r, ro, rd, tri_only)
                bt = jnp.min(t, axis=1, keepdims=True)  # (B, 1)
                col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                bi = jnp.min(jnp.where(t == bt, col, TC), axis=1,
                             keepdims=True)
                better = (bt < t_o[:]) & ch_hit
                one_hot = col == bi

                @pl.when(jnp.any(better))
                def _():
                    # ~30% of the brute chunk cost is this winner
                    # extraction; skip it when no lane improved
                    _select_winner(r, ro, rd, bt, better, one_hot,
                                   t_o, g_o, u_o, v_o, ng_o, ob_o,
                                   sph_o, u, v, tri_only)


def _visit_cluster_deferred(idx, cab_ref, rows_hbm, buf, sem, ro, rd,
                            inv_d, t_o, wid_o, tri_only=False):
    """GATELESS closest-hit visit: DMA the cluster block and brute-test
    all its prims fused, recording only (t, winner id) per lane;
    attribute extraction is deferred to `_resolve_winner` outside the
    kernel (in-kernel one-hot extraction measured 300 of 681 ms).

    Measured on realistic bounce rays (knot290k, CM=256,
    scripts/ablate_cluster.py): the former per-chunk (B,K=2) slab gates
    + their pl.when branches cost MORE than the brute tests they skip —
    base 349 ms vs no_chunk_gate 260 ms; slab passes 145 ms vs brute 92
    ms. (B,2)-shaped ops waste 126/128 VPU lanes and cross-lane any()
    reductions are branch-priced. Correctness never needed the gate: an
    accepted hit has bt < t_o, which implies the ray entered the chunk
    box before t_o. Brute width is capped at 512 lanes so the ~19 live
    (B, BR) intermediates stay under the VMEM budget at large CM."""
    CM = buf.shape[1]
    if "sweep_only" in _ABLATE:
        t_o[:] = jnp.minimum(t_o[:], jnp.float32(1e6) + idx)
        return
    if "no_dma" not in _ABLATE:
        dma = pltpu.make_async_copy(rows_hbm.at[idx], buf, sem)
        dma.start()
        dma.wait()
    BR = min(CM, 512)
    for kc in range(CM // BR):            # static unroll
        r = buf[:, kc * BR:(kc + 1) * BR]            # (24, BR)
        t, _u, _v = _prim_chunk_test(r, ro, rd, tri_only)   # (B, BR)
        bt = jnp.min(t, axis=1, keepdims=True)       # (B, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        bi = jnp.min(jnp.where(t == bt, col, BR), axis=1, keepdims=True)
        better = bt < t_o[:]
        t_o[:] = jnp.where(better, bt, t_o[:])
        wid_o[:] = jnp.where(better, idx * CM + kc * BR + bi, wid_o[:])


def _visit_cluster_deferred_gated(idx, cab_ref, rows_hbm, buf, sem, ro,
                                  rd, inv_d, t_o, wid_o, tri_only=False):
    """Chunk-gated variant of `_visit_cluster_deferred` for OVERFLOW
    tile-groups (shortlist longer than S entries), which sweep all C
    clusters in index order. There the gate maths flips: a listed sweep
    visits ~8-100 clusters that some ray provably enters (gates mostly
    pass -> pure overhead), while an overflow sweep visits every cluster
    in the scene and almost all gates fail -> each skipped DMA + brute
    block pays for hundreds of (B,K) slab tests. Accepted hits satisfy
    bt < t_o which implies the chunk box was entered before t_o, so
    gating never drops a winner (same argument as the legacy tier)."""
    K = buf.shape[1] // TC
    chm = _chunk_hits(cab_ref, idx, K, ro, inv_d, t_o[:])    # (B, K)

    @pl.when(jnp.any(chm))
    def _():
        CM = buf.shape[1]
        dma = pltpu.make_async_copy(rows_hbm.at[idx], buf, sem)
        dma.start()
        dma.wait()
        for kc in range(K):               # static unroll (K = CM/128)
            ch_hit = chm[:, kc:kc + 1]

            @pl.when(jnp.any(ch_hit))
            def _(kc=kc, ch_hit=ch_hit):
                r = buf[:, kc * TC:(kc + 1) * TC]       # (24, TC)
                t, _u, _v = _prim_chunk_test(r, ro, rd, tri_only)
                bt = jnp.min(t, axis=1, keepdims=True)
                col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                bi = jnp.min(jnp.where(t == bt, col, TC), axis=1,
                             keepdims=True)
                better = bt < t_o[:]
                t_o[:] = jnp.where(better, bt, t_o[:])
                wid_o[:] = jnp.where(better, idx * CM + kc * TC + bi,
                                     wid_o[:])


def _visit_cluster_any_gateless(idx, rows_hbm, buf, sem, ro, rd, far_ref,
                                occ_o, tri_only=False):
    """Gateless any-hit visit for the shortlist sweep (same measured
    rationale as `_visit_cluster_deferred`: chunk slab gates + branches
    cost more than unconditional brute at CM=256). Occluded lanes simply
    re-detect hits (occ_o is monotone under |=); the all-occluded early
    exit lives in the sweep loop."""
    CM = buf.shape[1]
    dma = pltpu.make_async_copy(rows_hbm.at[idx], buf, sem)
    dma.start()
    dma.wait()
    BR = min(CM, 512)
    for kc in range(CM // BR):
        r = buf[:, kc * BR:(kc + 1) * BR]
        t, _u, _v = _prim_chunk_test(r, ro, rd, tri_only)
        occ_o[:] = occ_o[:] | jnp.any(t < far_ref[:], axis=1,
                                      keepdims=True)


def _visit_cluster_any(idx, cab_ref, rows_hbm, buf, sem, ro, rd, inv_d,
                       far_ref, occ_o, tri_only=False):
    K = buf.shape[1] // TC
    # occluded lanes prune boxes (-inf beats inside-the-box t_near<0)
    far = jnp.where(occ_o[:], -jnp.inf, far_ref[:])
    chm = _chunk_hits(cab_ref, idx, K, ro, inv_d, far)

    @pl.when(jnp.any(chm))
    def _():
        dma = pltpu.make_async_copy(rows_hbm.at[idx], buf, sem)
        dma.start()
        dma.wait()
        for kc in range(K):
            ch_hit = chm[:, kc:kc + 1]

            @pl.when(jnp.any(ch_hit))
            def _(kc=kc, ch_hit=ch_hit):
                r = buf[:, kc * TC:(kc + 1) * TC]
                t, _u, _v = _prim_chunk_test(r, ro, rd, tri_only)
                hit = jnp.any((t < far_ref[:]) & ch_hit, axis=1,
                              keepdims=True)
                occ_o[:] = occ_o[:] | hit


def _closest_kernel(tri_only, order_ref, ro_ref, rd_ref, far_ref, abt_ref,
                    cab_ref, rows_hbm, t_o, g_o, u_o, v_o, ng_o, ob_o,
                    sph_o, buf, m_ref, sem):
    i = pl.program_id(0)
    C = order_ref.shape[1]

    t_o[:] = far_ref[:]
    g_o[:] = jnp.full_like(g_o[:], -1)
    u_o[:] = jnp.zeros_like(u_o[:])
    v_o[:] = jnp.zeros_like(v_o[:])
    ng_o[:, 0:1] = jnp.ones_like(ng_o[:, 0:1])
    ng_o[:, 1:3] = jnp.zeros_like(ng_o[:, 1:3])
    ob_o[:] = jnp.full_like(ob_o[:], -1)
    sph_o[:] = jnp.zeros_like(sph_o[:])

    ro = ro_ref[:]                            # (B, 3)
    rd = rd_ref[:]
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, 1e-9, rd)

    def sweep(carry):
        j, _ = carry

        @pl.when(j % REMASK == 0)
        def _():
            _refresh_mask(m_ref, abt_ref, ro, inv_d, t_o[:])

        # all-zero mask => no remaining cluster box beats any lane's
        # t_best => the sweep can stop (remaining ⊆ all clusters).
        # The mask only changes on refresh steps, so reduce it only then
        # (a cross-lane sum is ~us-scale) and carry the flag otherwise.
        done = jax.lax.cond(j % REMASK == 0,
                            lambda: jnp.sum(m_ref[0:1, :]) == 0.0,
                            lambda: carry[1])
        idx = order_ref[i // G_ORDER, j]

        @pl.when(_mask_at(m_ref, idx) > 0.0)
        def _():
            _visit_cluster_closest(idx, cab_ref, rows_hbm, buf, sem, ro,
                                   rd, inv_d, t_o, g_o, u_o, v_o, ng_o,
                                   ob_o, sph_o, tri_only)
        return j + 1, done

    jax.lax.while_loop(lambda c: (c[0] < C) & jnp.logical_not(c[1]),
                       sweep, (jnp.int32(0), jnp.bool_(False)))


def _select_winner(r, ro, rd, bt, better, one_hot, t_o, g_o, u_o, v_o,
                   ng_o, ob_o, sph_o, u, v, tri_only=False):
    def sel(row):                             # (1,TC) field row -> (B,1)
        return jnp.sum(jnp.where(one_hot, row, 0.0), axis=1,
                       keepdims=True)

    def selv(vals):                           # (B,TC) values -> (B,1)
        return jnp.sum(jnp.where(one_hot, vals, 0.0), axis=1,
                       keepdims=True)

    if tri_only:
        is_sph = jnp.zeros_like(bt) > 0.0
        ngx, ngy, ngz = (sel(r[14:15, :]), sel(r[15:16, :]),
                         sel(r[16:17, :]))
    else:
        # sphere lanes get their final normal here; spherical uv needs
        # atan2/arccos (no Pallas TPU lowering), so the wrapper derives
        # it from n_g on sphere-flagged lanes
        is_sph = sel(r[12:13, :]) > 0.5
        hx = ro[:, 0:1] + bt * rd[:, 0:1] - sel(r[0:1, :])
        hy = ro[:, 1:2] + bt * rd[:, 1:2] - sel(r[1:2, :])
        hz = ro[:, 2:3] + bt * rd[:, 2:3] - sel(r[2:3, :])
        inv_n = jax.lax.rsqrt(
            jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-24))
        nx, ny, nz = hx * inv_n, hy * inv_n, hz * inv_n
        ngx = jnp.where(is_sph, nx, sel(r[14:15, :]))
        ngy = jnp.where(is_sph, ny, sel(r[15:16, :]))
        ngz = jnp.where(is_sph, nz, sel(r[16:17, :]))

    t_o[:] = jnp.where(better, bt, t_o[:])
    g_o[:] = jnp.where(better, sel(r[13:14, :]).astype(jnp.int32), g_o[:])
    u_o[:] = jnp.where(better, selv(u), u_o[:])
    v_o[:] = jnp.where(better, selv(v), v_o[:])
    ng_o[:, 0:1] = jnp.where(better, ngx, ng_o[:, 0:1])
    ng_o[:, 1:2] = jnp.where(better, ngy, ng_o[:, 1:2])
    ng_o[:, 2:3] = jnp.where(better, ngz, ng_o[:, 2:3])
    ob_o[:] = jnp.where(better, sel(r[17:18, :]).astype(jnp.int32),
                        ob_o[:])
    sph_o[:] = jnp.where(better, is_sph.astype(jnp.int32), sph_o[:])


def _any_kernel(tri_only, order_ref, ro_ref, rd_ref, far_ref, abt_ref,
                cab_ref, rows_hbm, occ_o, buf, m_ref, sem):
    i = pl.program_id(0)
    C = order_ref.shape[1]

    occ_o[:] = jnp.zeros_like(occ_o[:])

    ro = ro_ref[:]
    rd = rd_ref[:]
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, 1e-9, rd)

    def sweep(carry):
        j, _ = carry

        @pl.when(j % REMASK == 0)
        def _():
            # done lanes prune boxes (-inf beats inside-the-box t_near<0)
            far = jnp.where(occ_o[:], -jnp.inf, far_ref[:])
            _refresh_mask(m_ref, abt_ref, ro, inv_d, far)

        # all lanes occluded (or nothing left in reach) => mask all-zero;
        # reduced only on refresh steps, carried through otherwise
        done = jax.lax.cond(j % REMASK == 0,
                            lambda: jnp.sum(m_ref[0:1, :]) == 0.0,
                            lambda: carry[1])
        idx = order_ref[i // G_ORDER, j]

        @pl.when(_mask_at(m_ref, idx) > 0.0)
        def _():
            _visit_cluster_any(idx, cab_ref, rows_hbm, buf, sem, ro, rd,
                               inv_d, far_ref, occ_o, tri_only)
        return j + 1, done

    jax.lax.while_loop(lambda c: (c[0] < C) & jnp.logical_not(c[1]),
                       sweep, (jnp.int32(0), jnp.bool_(False)))


def _sl_entry(sl_ref, g, j, over):
    """Cluster index of shortlist entry j (packed int16 pairs in SMEM).

    Overflow groups sweep all C clusters in index order instead; the read
    is clamped in-bounds (and its value ignored) on that path."""
    w = sl_ref[g, jnp.minimum(j // 2, SL_WORDS - 1)]
    half = jnp.where(j % 2 == 0, w & 0xffff, (w >> 16) & 0xffff)
    return jnp.where(over, j, half)


def _closest_sl_kernel(tri_only, G, cap, cnt_ref, sl_ref, eblk_ref,
                       ro_ref, rd_ref, far_ref, wid0_ref, cab_ref,
                       rows_hbm, t_o, wid_o, buf, sem):
    """cap > 0 bounds the sweep to the first cap candidates (phase 1 of
    the two-phase closest hit: any hit found is a valid far bound, so a
    truncated front-to-back sweep is sound there). wid0 carries phase-1
    winners into phase 2 (whose t_o starts at far = the phase-1 t, so a
    winner exactly AT far must already be recorded)."""
    i = pl.program_id(0)
    g = i // G
    C = cab_ref.shape[0] // 8
    cnt = cnt_ref[0, g]
    over = cnt > 2 * SL_WORDS
    n = jnp.where(over, jnp.int32(C), cnt)
    if cap > 0:
        n = jnp.minimum(n, jnp.int32(cap))

    t_o[:] = far_ref[:]
    wid_o[:] = wid0_ref[:]

    ro = ro_ref[:]                            # (B, 3)
    rd = rd_ref[:]
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, 1e-9, rd)

    def sweep(carry):
        j, done = carry
        idx = _sl_entry(sl_ref, g, j, over)

        @pl.when(jnp.logical_not(over))
        def _():
            if GATELESS:
                _visit_cluster_deferred(idx, cab_ref, rows_hbm, buf, sem,
                                        ro, rd, inv_d, t_o, wid_o,
                                        tri_only)
            else:
                _visit_cluster_deferred_gated(idx, cab_ref, rows_hbm,
                                              buf, sem, ro, rd, inv_d,
                                              t_o, wid_o, tri_only)

        @pl.when(over)
        def _():
            _visit_cluster_deferred_gated(idx, cab_ref, rows_hbm, buf,
                                          sem, ro, rd, inv_d, t_o, wid_o,
                                          tri_only)

        # front-to-back early exit at block boundaries: remaining listed
        # clusters all have entry >= eblk[nj/EB_E] (the list is sorted by
        # the same inflated-box entry), and any prim hit inside a cluster
        # satisfies t >= its entry, so nothing can beat a lane whose
        # t_best is already below the threshold. Cross-lane max is
        # branch-priced (~us) — only at EB_E cadence. Dead lanes carry
        # t_o = -3e38 and never block the max. Overflow groups sweep in
        # index order, where the thresholds don't apply.
        nj = j + 1
        done = jax.lax.cond(
            (nj % EB_E == 0) & (nj < n) & jnp.logical_not(over),
            lambda: eblk_ref[g, nj // EB_E] >= jnp.max(t_o[:]),
            lambda: done)
        return nj, done

    jax.lax.while_loop(lambda c: (c[0] < n) & jnp.logical_not(c[1]),
                       sweep, (jnp.int32(0), jnp.bool_(False)))


def _resolve_winner(scene, wid, t, ro, rd):
    """(gid, u, v, n_g, obj) of deferred winner ids, outside the kernel.

    ONE contiguous (N, 24) row-gather from the prim-major table copy
    `cl_rows_pm` instead of per-brute-chunk one-hot extraction in the
    kernel (measured 300 of 681 ms) or 16 scattered scalar gathers off
    the field-major cl_rows (measured 37.6 ms/bounce — 17% of the
    knot290k render). The uv / sphere-normal formulas replicate
    `_prim_chunk_test` / `_select_winner` op-for-op so the results match
    the in-kernel extraction path bit-for-bit up to FMA rounding. Misses
    (wid<0) get the standard defaults (-1 ids, n_g=(1,0,0), uv=0)."""
    miss = wid < 0
    w = jnp.where(miss, 0, wid)
    rows = jnp.take(scene.cl_rows_pm, w, axis=0)       # (N, 24)

    def fld(k):
        return rows[:, k]

    gid = jnp.where(miss, -1, fld(13).astype(jnp.int32))
    obj = jnp.where(miss, -1, fld(17).astype(jnp.int32))
    # triangle uv: u = ro·U + t·(rd·U) - cu, same op order as dot3
    ux, uy, uz, cu = fld(4), fld(5), fld(6), fld(7)
    vx, vy, vz, cv = fld(8), fld(9), fld(10), fld(11)
    u_tri = ((ro[:, 0] * ux + ro[:, 1] * uy) + ro[:, 2] * uz) \
        + t * ((rd[:, 0] * ux + rd[:, 1] * uy) + rd[:, 2] * uz) - cu
    v_tri = ((ro[:, 0] * vx + ro[:, 1] * vy) + ro[:, 2] * vz) \
        + t * ((rd[:, 0] * vx + rd[:, 1] * vy) + rd[:, 2] * vz) - cv
    if _tri_only(scene):
        ngx, ngy, ngz = fld(14), fld(15), fld(16)
        u, v = u_tri, v_tri
    else:
        is_sph = fld(12) > 0.5
        # sphere: normal from the hit point, uv from the normal
        # (reference tracer_base.py:226-231 formulas)
        hx = ro[:, 0] + t * rd[:, 0] - fld(0)
        hy = ro[:, 1] + t * rd[:, 1] - fld(1)
        hz = ro[:, 2] + t * rd[:, 2] - fld(2)
        inv_n = jax.lax.rsqrt(
            jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-24))
        nx, ny, nz = hx * inv_n, hy * inv_n, hz * inv_n
        ngx = jnp.where(is_sph, nx, fld(14))
        ngy = jnp.where(is_sph, ny, fld(15))
        ngz = jnp.where(is_sph, nz, fld(16))
        sph_u = (jnp.arctan2(ngy, ngx) + jnp.pi) / (2.0 * jnp.pi)
        sph_v = jnp.arccos(jnp.clip(ngz, -1.0, 1.0)) / jnp.pi
        u = jnp.where(is_sph, sph_u, u_tri)
        v = jnp.where(is_sph, sph_v, v_tri)
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    n_g = jnp.stack([jnp.where(miss, 1.0, ngx),
                     jnp.where(miss, 0.0, ngy),
                     jnp.where(miss, 0.0, ngz)], axis=-1)
    return gid, u, v, n_g, obj


def _any_sl_kernel(tri_only, G, cnt_ref, sl_ref, eblk_ref, ro_ref, rd_ref,
                   far_ref, cab_ref, rows_hbm, occ_o, buf, sem):
    i = pl.program_id(0)
    g = i // G
    C = cab_ref.shape[0] // 8
    cnt = cnt_ref[0, g]
    over = cnt > 2 * SL_WORDS
    n = jnp.where(over, jnp.int32(C), cnt)

    occ_o[:] = jnp.zeros_like(occ_o[:])

    ro = ro_ref[:]
    rd = rd_ref[:]
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, 1e-9, rd)

    def sweep(carry):
        j, done = carry
        idx = _sl_entry(sl_ref, g, j, over)

        @pl.when(jnp.logical_not(over))
        def _():
            if GATELESS:
                _visit_cluster_any_gateless(idx, rows_hbm, buf, sem, ro,
                                            rd, far_ref, occ_o, tri_only)
            else:
                _visit_cluster_any(idx, cab_ref, rows_hbm, buf, sem, ro,
                                   rd, inv_d, far_ref, occ_o, tri_only)

        @pl.when(over)
        def _():
            # overflow sweeps all C clusters: chunk-gate each visit
            # (same rationale as _visit_cluster_deferred_gated)
            _visit_cluster_any(idx, cab_ref, rows_hbm, buf, sem, ro, rd,
                               inv_d, far_ref, occ_o, tri_only)

        # early exit at block boundaries (cross-lane reductions are
        # branch-priced, so only at EB_E cadence): a lane is settled
        # once occluded or dead (far<=0), and — the shadow-ray win —
        # once the next block's entry distance reaches its far (any
        # remaining hit would land at t >= entry >= far: beyond the
        # light). Overflow groups only use the all-settled half. The
        # SMEM read is index-clamped and masked by where() rather than a
        # nested cond (single-level lax.cond is the only Mosaic-proven
        # shape in these kernels).
        nj = j + 1
        NB = eblk_ref.shape[1]       # >= 1 for any EB_E (never index -1)
        thr = eblk_ref[g, jnp.minimum(nj // EB_E, NB - 1)]
        thr = jnp.where((nj < n) & jnp.logical_not(over), thr,
                        jnp.float32(0.0))
        done = jax.lax.cond(
            nj % EB_E == 0,
            lambda: jnp.all(occ_o[:] | (far_ref[:] <= thr)),
            lambda: done)
        return nj, done

    jax.lax.while_loop(lambda c: (c[0] < n) & jnp.logical_not(c[1]),
                       sweep, (jnp.int32(0), jnp.bool_(False)))


def _tile_shortlists(cl_aabb, ro, rd, far):
    """Front-to-back per-tile-group cluster shortlists, built with one
    dense slab pass outside the kernel.

    Returns (counts (1, ng) i32, packed (ng, SL_WORDS) i32 — two int16
    cluster ids per word, front-to-back —, eblk (ng, S/EB_E) f32 — the
    entry distance of every EB_E'th listed cluster, the sweep's
    early-exit thresholds — and G, the tiles per group).
    counts[g] may exceed 2*SL_WORDS: the kernel then ignores the (then
    truncated) list and sweeps all clusters. Cluster boxes are inflated
    a few ulp so XLA/Mosaic FMA differences can only ADD candidates
    relative to the kernel's own chunk slab tests, never drop one — and
    so eblk entry distances are safe LOWER bounds on any representable
    prim-hit t inside the listed cluster."""
    nt = ro.shape[0] // LANE_B
    G = -(-nt // SL_MAX_ROWS)
    ng = -(-nt // G)
    pad = ng * G * LANE_B - ro.shape[0]
    if pad:
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
        far = jnp.pad(far, ((0, pad), (0, 0)), constant_values=-3e38)
    GB = G * LANE_B
    C = cl_aabb.shape[0]
    ext = jnp.abs(cl_aabb[:, 0:3]) + jnp.abs(cl_aabb[:, 3:6]) + 1.0
    lo = cl_aabb[:, 0:3] - 1e-6 * ext                    # (C, 3)
    hi = cl_aabb[:, 3:6] + 1e-6 * ext
    o = ro.reshape(ng, GB, 3)
    d = rd.reshape(ng, GB, 3)
    f = far.reshape(ng, GB, 1)
    # batch groups so one (gb, GB, C) slab intermediate stays bounded
    gb = max(1, min(ng, _SL_MAX_ELEMS // max(GB * C, 1)))
    ngp = -(-ng // gb) * gb
    if ngp != ng:
        o = jnp.pad(o, ((0, ngp - ng), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, ngp - ng), (0, 0), (0, 0)),
                    constant_values=1.0)
        f = jnp.pad(f, ((0, ngp - ng), (0, 0), (0, 0)),
                    constant_values=-3e38)

    def batch(args):
        o, d, f = args                       # (gb, GB, 3), (gb, GB, 1)
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        tn = jnp.full((gb, GB, C), -jnp.inf, jnp.float32)
        tf = jnp.full((gb, GB, C), jnp.inf, jnp.float32)
        for k in range(3):
            t1 = (lo[None, None, :, k] - o[:, :, k:k + 1]) \
                * inv[:, :, k:k + 1]
            t2 = (hi[None, None, :, k] - o[:, :, k:k + 1]) \
                * inv[:, :, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < f)
        anyhit = jnp.any(hit, axis=1)                        # (gb, C)
        entry = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf),
                        axis=1)
        return anyhit, entry

    anyhit, entry = jax.lax.map(
        batch, (o.reshape(ngp // gb, gb, GB, 3),
                d.reshape(ngp // gb, gb, GB, 3),
                f.reshape(ngp // gb, gb, GB, 1)))
    anyhit = anyhit.reshape(ngp, C)[:ng]
    entry = entry.reshape(ngp, C)[:ng]
    counts = jnp.sum(anyhit, axis=1).astype(jnp.int32)       # (ng,)
    keyed = jnp.where(anyhit, entry, jnp.inf)
    order = jnp.argsort(keyed, axis=1).astype(jnp.int32)     # (ng, C)
    sorted_e = jnp.sort(keyed, axis=1)                       # (ng, C)
    S = 2 * SL_WORDS
    if C < S:
        order = jnp.pad(order, ((0, 0), (0, S - C)))
        sorted_e = jnp.pad(sorted_e, ((0, 0), (0, S - C)),
                           constant_values=jnp.inf)
    idx = order[:, :S]
    packed = idx[:, 0::2] | (idx[:, 1::2] << 16)     # (ng, SL_WORDS)
    eblk = sorted_e[:, 0:S:EB_E]                     # (ng, S/EB_E)
    return counts.reshape(1, ng), packed, eblk, G


def primary_cluster_key(scene, ro, rd, far):
    """Per-ray wavefront sort key: (nearest-entered-cluster id, octant).

    The generic Morton/octant coherence key leaves bounce-ray tiles
    sweeping a mean 66 of 415 cluster boxes on knot290k, yet each RAY
    individually enters only ~1.2 (scripts/measure_incidence.py) — so
    ~98% of brute-chunk lanes belong to rays that cannot hit the cluster
    being tested. Keying the sort by each ray's front-most entered
    cluster id packs same-cluster rays into the same LANE_B tile, which
    collapses the per-tile shortlist toward the per-ray bound and makes
    most brute lanes useful. Rays entering no box — and dead lanes
    (far<=0) — key to C and pack last."""
    C = scene.cl_aabb.shape[0]
    lo = scene.cl_aabb[:, 0:3]
    hi = scene.cl_aabb[:, 3:6]
    N = ro.shape[0]
    Bb = max(128, min(N, _SL_MAX_ELEMS // max(C, 1)))
    Np = -(-N // Bb) * Bb
    o = jnp.pad(ro, ((0, Np - N), (0, 0)))
    d = jnp.pad(rd, ((0, Np - N), (0, 0)), constant_values=1.0)
    f = jnp.pad(far, ((0, Np - N),), constant_values=-3e38)

    def blk(args):
        o, d, f = args
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        tn = jnp.full((Bb, C), -jnp.inf, jnp.float32)
        tf = jnp.full((Bb, C), jnp.inf, jnp.float32)
        for k in range(3):
            t1 = (lo[None, :, k] - o[:, k:k + 1]) * inv[:, k:k + 1]
            t2 = (hi[None, :, k] - o[:, k:k + 1]) * inv[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < f[:, None])
        entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
        cid = jnp.argmin(entry, axis=1).astype(jnp.int32)
        return jnp.where(jnp.any(hit, axis=1), cid, jnp.int32(C))

    cid = jax.lax.map(blk, (o.reshape(-1, Bb, 3), d.reshape(-1, Bb, 3),
                            f.reshape(-1, Bb))).reshape(Np)[:N]
    octant = ((rd[:, 0] > 0).astype(jnp.int32)
              + 2 * (rd[:, 1] > 0).astype(jnp.int32)
              + 4 * (rd[:, 2] > 0).astype(jnp.int32))
    return cid * 8 + octant


def _ray_blocks(ray_o, ray_d, far0):
    N = ray_o.shape[0]
    Np = -(-N // LANE_B) * LANE_B
    ro = jnp.pad(ray_o, ((0, Np - N), (0, 0)))
    rd = jnp.pad(ray_d, ((0, Np - N), (0, 0)), constant_values=1.0)
    # padding lanes get the dead-ray far (-3e38): with far=0 an
    # inside-a-box slab test (t_near<0<t_far) still passes and the last
    # partial tile's mask never reaches all-zero (no early exit)
    far = jnp.pad(far0.reshape(N, 1), ((0, Np - N), (0, 0)),
                  constant_values=-3e38)
    return ro, rd, far, Np


def _tile_cluster_order(cl_aabb, ro, rd):
    """(n_tile_groups, C) i32: clusters sorted front-to-back per group of
    G_ORDER adjacent ray tiles.

    Each group's representative ray = (mean origin, normalized mean
    direction); clusters are keyed by slab-test entry distance, with
    missed boxes pushed behind all hit boxes ordered by centroid distance.
    Order only affects how fast the kernel's per-lane `t_near < t_best`
    prune starts firing — correctness never depends on it. Tiles are
    sorted by (entered-cluster id, octant) keys (`primary_cluster_key` /
    the renderers' key hints), so a group shares a front cluster and
    direction octant and the representative ray is meaningful. Grouping
    keeps the prefetched SMEM table small (a per-tile table at 512 tiles x
    415 clusters overflowed the 1M SMEM budget)."""
    nt = ro.shape[0] // LANE_B
    ng = -(-nt // G_ORDER)
    pad = ng * G_ORDER * LANE_B - ro.shape[0]
    if pad:
        ro = jnp.pad(ro, ((0, pad), (0, 0)), mode="edge")
        rd = jnp.pad(rd, ((0, pad), (0, 0)), mode="edge")
    o = ro.reshape(ng, G_ORDER * LANE_B, 3).mean(1)    # (ng,3)
    d = rd.reshape(ng, G_ORDER * LANE_B, 3).mean(1)
    dn = jnp.sqrt(jnp.sum(d * d, -1, keepdims=True))
    d = jnp.where(dn > 1e-3, d / jnp.maximum(dn, 1e-6),
                  jnp.array([1.0, 0.0, 0.0], jnp.float32))
    lo, hi = cl_aabb[:, 0:3], cl_aabb[:, 3:6]          # (C,3)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-6, 1e-6, d)
    t1 = (lo[None] - o[:, None]) * inv[:, None]        # (ng,C,3)
    t2 = (hi[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t1, t2), -1)
    tf = jnp.min(jnp.maximum(t1, t2), -1)
    hit = tf >= jnp.maximum(tn, 0.0)
    c = (lo + hi) * 0.5
    dist = jnp.sqrt(jnp.sum((c[None] - o[:, None]) ** 2, -1))
    key = jnp.where(hit, jnp.maximum(tn, 0.0), 1e6 + dist)
    return jnp.argsort(key, axis=1).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _specs(Np, shortlist=False, wid0=False):
    grid = (Np // LANE_B,)
    ray = pl.BlockSpec((LANE_B, 3), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    far = pl.BlockSpec((LANE_B, 1), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    # whole (8,Cp)/(C*8,K) tables resident (hundreds of KB at most)
    ab = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec(memory_space=pl.ANY)       # whole array, manual DMA
    out1 = pl.BlockSpec((LANE_B, 1), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((LANE_B, 3), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    if shortlist:
        ins = [ray, ray, far] + ([far] if wid0 else []) + [ab, rows]
    else:
        ins = [ray, ray, far, ab, ab, rows]
    return grid, ins, out1, out3


def _closest_sl_pass(scene, ro, rd, far, Np, wid0, cap, lists=None):
    """One shortlist-kernel closest pass over pre-blocked rays.

    lists: optional prebuilt (counts, packed, eblk, G) — the march path
    synthesizes per-group candidate lists from the lanes' own cluster ids
    instead of the dense tile-union slab pass."""
    C, F, CM = scene.cl_rows.shape
    counts, packed, eblk, G = lists if lists is not None \
        else _tile_shortlists(scene.cl_aabb, ro, rd, far)
    grid, in_specs, out1, out3 = _specs(Np, shortlist=True, wid0=True)
    return pl.pallas_call(
        functools.partial(_closest_sl_kernel, _tri_only(scene), G, cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=[out1, out1],
            scratch_shapes=[pltpu.VMEM((F, CM), jnp.float32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.int32)],
        interpret=_INTERPRET,
    )(counts, packed, eblk, ro, rd, far, wid0, scene.cl_chunk,
      scene.cl_rows)


def cluster_closest_raw(scene, ray_o, ray_d, far0):
    """Shortlist-path closest hit returning only (t (N,), wid (N,) i32).

    wid packs (cluster, chunk, lane) as cluster*CM + chunk*TC + lane
    (-1 = miss); attributes are recovered by `_resolve_winner`, which is
    order-independent — callers that sort the wavefront can unsort just
    these TWO fields (a 3-operand lax.sort instead of 9: the unsort of
    the full (t,gid,u,v,n_g,obj) record measured ~240 ms at 512^2) and
    resolve in original ray order.

    TWO-PHASE sweep (ADAPT_TWO_PHASE, default on): with far0=inf a
    bounce ray's shortlist holds every cluster its LINE enters — most
    lie behind the eventual hit (measured knot290k 512^2: 93.5 listed
    visits/tile vs 13.5 once far is tightened to the true hit,
    scripts/sim_early_exit.py). Phase 1 sweeps only the first PH1_CAP
    front-to-back candidates (any hit found is a sound upper bound on
    the closest t); phase 2 rebuilds the shortlists with that bound as
    far — behind-the-hit clusters drop out of the lists entirely — and
    starts from the phase-1 (t, wid) so an exact tie stays recorded."""
    N = ray_o.shape[0]
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    wid_init = jnp.full((Np, 1), -1, jnp.int32)
    if TWO_PHASE:
        t1, wid1 = _closest_sl_pass(scene, ro, rd, far, Np, wid_init,
                                    PH1_CAP)
        t, wid = _closest_sl_pass(scene, ro, rd, t1, Np, wid1, 0)
    else:
        t, wid = _closest_sl_pass(scene, ro, rd, far, Np, wid_init, 0)
    return t[:N, 0], wid[:N, 0]


def _next_candidates(scene, ro, rd, tn_last, cid_last, t_best):
    """Per-ray front-most UNVISITED cluster along the ray.

    Among clusters whose (inflated, like _tile_shortlists) slab interval
    is non-empty with entry < t_best, pick the one minimizing (entry,
    cid) lexicographically subject to being strictly after the carried
    cursor (tn_last, cid_last) — equal-entry clusters are visited in cid
    order, so ties never skip a box. Returns (cid (N,) i32 — C when the
    ray has no unvisited candidate — and its entry distance).
    Entry distances are clamped to 0 (a ray starting inside a box enters
    at 0), matching the eblk lower-bound convention."""
    C = scene.cl_aabb.shape[0]
    ext = jnp.abs(scene.cl_aabb[:, 0:3]) + jnp.abs(scene.cl_aabb[:, 3:6]) \
        + 1.0
    lo = scene.cl_aabb[:, 0:3] - 1e-6 * ext
    hi = scene.cl_aabb[:, 3:6] + 1e-6 * ext
    N = ro.shape[0]
    Bb = max(128, min(N, _SL_MAX_ELEMS // max(C, 1)))
    Np2 = -(-N // Bb) * Bb
    o = jnp.pad(ro, ((0, Np2 - N), (0, 0)))
    d = jnp.pad(rd, ((0, Np2 - N), (0, 0)), constant_values=1.0)
    tl = jnp.pad(tn_last, (0, Np2 - N))
    cl_ = jnp.pad(cid_last, (0, Np2 - N))
    tb = jnp.pad(t_best, (0, Np2 - N), constant_values=-3e38)

    def blk(args):
        o, d, tl, cl_, tb = args
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        tn = jnp.full((Bb, C), -jnp.inf, jnp.float32)
        tf = jnp.full((Bb, C), jnp.inf, jnp.float32)
        for k in range(3):
            t1 = (lo[None, :, k] - o[:, k:k + 1]) * inv[:, k:k + 1]
            t2 = (hi[None, :, k] - o[:, k:k + 1]) * inv[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        ent = jnp.maximum(tn, 0.0)
        ids = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 1)
        after = (ent > tl[:, None]) \
            | ((ent == tl[:, None]) & (ids > cl_[:, None]))
        cand = (tf >= ent) & (ent < tb[:, None]) & after
        keyed = jnp.where(cand, ent, jnp.inf)
        mt = jnp.min(keyed, axis=1)
        first = cand & (keyed == mt[:, None])
        cid = jnp.argmax(first, axis=1).astype(jnp.int32)
        has = jnp.any(cand, axis=1)
        return (jnp.where(has, cid, jnp.int32(C)),
                jnp.where(has, mt, jnp.float32(3e38)))

    cid, tn = jax.lax.map(blk, (o.reshape(-1, Bb, 3),
                                d.reshape(-1, Bb, 3),
                                tl.reshape(-1, Bb), cl_.reshape(-1, Bb),
                                tb.reshape(-1, Bb)))
    return cid.reshape(Np2)[:N], tn.reshape(Np2)[:N]


def _march_lists(cid_sorted, Np, C):
    """Synthesize (counts, packed, eblk, G) shortlist tables from the
    sorted lanes' OWN candidate cluster ids.

    cid_sorted is ascending (the wavefront was just sorted by cid), so
    per tile-group distinct ids are run starts; the distinct values are
    extracted with one row sort (run starts keep their id, the rest key
    to a big sentinel). eblk thresholds are -3e38: every listed cluster
    is some lane's current front-to-back candidate, so the sweep's
    entry-distance early exit can never soundly fire mid-list — but an
    all-dead group (counts 0) never enters the sweep at all, which is
    what makes post-sort tail tiles free."""
    nt = Np // LANE_B
    G = -(-nt // SL_MAX_ROWS)
    ng = -(-nt // G)
    GB = G * LANE_B
    rows = jnp.pad(cid_sorted, (0, ng * GB - Np),
                   constant_values=jnp.int32(C)).reshape(ng, GB)
    valid = rows < C
    prev = jnp.concatenate(
        [jnp.full((ng, 1), -1, jnp.int32), rows[:, :-1]], axis=1)
    firsts = valid & (rows != prev)
    counts = jnp.sum(firsts, axis=1).astype(jnp.int32)
    S = 2 * SL_WORDS
    keyed = jnp.where(firsts, rows, jnp.int32(1) << 20)
    vals = jnp.sort(keyed, axis=1)
    if GB < S:
        vals = jnp.pad(vals, ((0, 0), (0, S - GB)),
                       constant_values=jnp.int32(1) << 20)
    idx = jnp.clip(vals[:, :S], 0, 0xffff)   # entries >= counts unread
    packed = idx[:, 0::2] | (idx[:, 1::2] << 16)
    eblk = jnp.full((ng, -(-S // EB_E)), -3e38, jnp.float32)
    return counts.reshape(1, ng), packed, eblk, G


def cluster_closest_march(scene, ray_o, ray_d, far0):
    """Per-ray front-to-back cluster march: closest hit at RAY (not tile)
    granularity. Returns (t, wid) in ORIGINAL ray order.

    The tile-union shortlist sweep pays for every cluster ANY lane of a
    tile enters (measured knot290k: 9.7 visits/tile on bounce rays),
    yet each ray individually enters ~1.2 (scripts/sim_ray_queues.py).
    The march iterates: (1) a dense (N, C) slab pass picks each ray's
    front-most unvisited cluster under its current t_best; (2) the
    wavefront sorts by that candidate id, packing same-cluster rays into
    the same LANE_B tile and finished rays to the dead tail; (3) one
    _closest_sl_kernel pass sweeps per-group DISTINCT candidate ids
    (~1-3, vs the union's ~10) synthesized by _march_lists. Hits
    tighten t_best, so round r+1's candidates shrink (phase-2 per-ray
    mean is 0.95). After MARCH_ROUNDS rounds the rare deep rays (p99 is
    3-4 candidates) finish through the exact tile-union two-phase pass
    with far = their tightened t_best — every cluster with entry below
    the final t is provably visited by one of the two stages, so the
    result is exact, not approximate.

    Reference behavior: tracer/path_tracer.py:338-422 (closest-hit
    contract); the decomposition itself has no reference analog."""
    from .intersect import _sort_by
    C = scene.cl_aabb.shape[0]
    N = ray_o.shape[0]
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    t_best = far[:, 0]
    wid = jnp.full((Np,), -1, jnp.int32)
    tn_last = jnp.full((Np,), -1.0, jnp.float32)
    cid_last = jnp.full((Np,), -1, jnp.int32)
    octant = ((rd[:, 0] > 0).astype(jnp.int32)
              + 2 * (rd[:, 1] > 0).astype(jnp.int32)
              + 4 * (rd[:, 2] > 0).astype(jnp.int32))
    pos0 = jnp.arange(Np, dtype=jnp.int32)
    for _ in range(MARCH_ROUNDS):
        cid, tn = _next_candidates(scene, ro, rd, tn_last, cid_last,
                                   t_best)
        active = cid < C
        key = jnp.where(active, cid * 8 + octant, 8 * C + 7)
        fs = jnp.where(active, t_best, -3e38)
        ro_s, rd_s, fs_s, w_s, cid_s, pos = _sort_by(
            key, [ro, rd, fs, wid, cid, pos0], seg=0)
        lists = _march_lists(cid_s, Np, C)
        t_s, w_s2 = _closest_sl_pass(scene, ro_s, rd_s, fs_s[:, None],
                                     Np, w_s[:, None], 0, lists=lists)
        t_new, w_new = _sort_by(pos, [t_s[:, 0], w_s2[:, 0]], seg=0)
        t_best = jnp.where(active, t_new, t_best)
        wid = jnp.where(active, w_new, wid)
        tn_last = jnp.where(active, tn, tn_last)
        cid_last = jnp.where(active, cid, cid_last)
    # exact cleanup for rays that still have unvisited candidates: the
    # ordinary tile-union shortlist pass, restricted to them via the
    # dead-lane far (finished rays pack last and their groups never
    # sweep). far is already tightened to t_best, so the union lists
    # cover only still-plausible clusters.
    cid, _tn = _next_candidates(scene, ro, rd, tn_last, cid_last, t_best)
    need = cid < C
    key = jnp.where(need, cid * 8 + octant, 8 * C + 7)
    fs = jnp.where(need, t_best, -3e38)
    ro_s, rd_s, fs_s, w_s, pos = _sort_by(
        key, [ro, rd, fs, wid, pos0], seg=0)
    t_s, w_s2 = _closest_sl_pass(scene, ro_s, rd_s, fs_s[:, None], Np,
                                 w_s[:, None], 0)
    t_new, w_new = _sort_by(pos, [t_s[:, 0], w_s2[:, 0]], seg=0)
    t_best = jnp.where(need, t_new, t_best)
    wid = jnp.where(need, w_new, wid)
    return t_best[:N], wid[:N]


def _topk_candidates(scene, ro, rd, far, K):
    """Per-ray first-K entered clusters, front-to-back.

    One blockwise dense (N, C) slab pass (boxes inflated a few ulp like
    _tile_shortlists, so FMA differences can only ADD candidates).
    Returns (ids (N, K) i32 — C where the ray has fewer candidates —,
    ents (N, K) f32 — the inflated-box entry distance of each candidate
    (+inf where invalid), a safe LOWER bound on any prim-hit t inside
    it, so `ent >= t_best` soundly prunes the entry —, and more (N,)
    bool: the ray enters MORE than K clusters before far, i.e. its
    queue is truncated and needs the exact cleanup pass).
    Candidate clusters of dead lanes (far <= 0) all key to C."""
    C = scene.cl_aabb.shape[0]
    ext = jnp.abs(scene.cl_aabb[:, 0:3]) + jnp.abs(scene.cl_aabb[:, 3:6]) \
        + 1.0
    lo = scene.cl_aabb[:, 0:3] - 1e-6 * ext
    hi = scene.cl_aabb[:, 3:6] + 1e-6 * ext
    N = ro.shape[0]
    Bb = max(128, min(N, _SL_MAX_ELEMS // max(C, 1)))
    Np = -(-N // Bb) * Bb
    o = jnp.pad(ro, ((0, Np - N), (0, 0)))
    d = jnp.pad(rd, ((0, Np - N), (0, 0)), constant_values=1.0)
    f = jnp.pad(far, (0, Np - N), constant_values=-3e38)

    def blk(args):
        o, d, f = args
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        tn = jnp.full((Bb, C), -jnp.inf, jnp.float32)
        tf = jnp.full((Bb, C), jnp.inf, jnp.float32)
        for k in range(3):
            t1 = (lo[None, :, k] - o[:, k:k + 1]) * inv[:, k:k + 1]
            t2 = (hi[None, :, k] - o[:, k:k + 1]) * inv[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        ent = jnp.maximum(tn, 0.0)
        hit = (tf >= ent) & (tn < f[:, None])
        keyed = jnp.where(hit, ent, jnp.inf)
        lane = jax.lax.broadcasted_iota(jnp.int32, keyed.shape, 1)
        ids = []
        ents = []
        for _ in range(K):
            mt = jnp.min(keyed, axis=1)
            has = jnp.isfinite(mt)
            # front-most candidate; equal entries resolve to the lowest
            # id first, the tie partner surfaces next iteration
            cid = jnp.min(jnp.where(keyed == mt[:, None], lane, C), axis=1)
            ids.append(jnp.where(has, cid, C).astype(jnp.int32))
            ents.append(jnp.where(has, mt, jnp.inf).astype(jnp.float32))
            keyed = jnp.where(lane == cid[:, None], jnp.inf, keyed)
        more = jnp.isfinite(jnp.min(keyed, axis=1))
        return jnp.stack(ids, axis=1), jnp.stack(ents, axis=1), more

    ids, ents, more = jax.lax.map(blk, (o.reshape(-1, Bb, 3),
                                        d.reshape(-1, Bb, 3),
                                        f.reshape(-1, Bb)))
    return (ids.reshape(Np, K)[:N], ents.reshape(Np, K)[:N],
            more.reshape(Np)[:N])


def _pack_ids(ids):
    """(N, K) i32 cluster ids (< 2^16) -> (N, ceil(K/2)) packed words, so
    the wavefront sort carries half the operands."""
    K = ids.shape[1]
    if K % 2:
        ids = jnp.pad(ids, ((0, 0), (0, 1)))
    return ids[:, 0::2] | (ids[:, 1::2] << 16)


def _unpack_id(packed, r):
    """Round-r candidate id from the packed words (r static)."""
    return (packed[:, r // 2] >> (16 * (r % 2))) & 0xffff


def _round_lists(cand, Np, C):
    """Synthesize (counts, packed, eblk, G) shortlist tables from the
    lanes' UNSORTED per-round candidate ids: each tile-group lists the
    DISTINCT candidates of its own lanes (two cheap axis-1 row sorts —
    distinct-extraction, then compaction). Inactive lanes carry C and
    contribute nothing; an all-inactive group gets count 0 and its sweep
    never starts. eblk thresholds are -3e38: every listed cluster is
    some lane's current front-to-back candidate, so the entry-distance
    early exit can never soundly fire (same argument as _march_lists)."""
    nt = Np // LANE_B
    G = -(-nt // SL_MAX_ROWS)
    ng = -(-nt // G)
    GB = G * LANE_B
    rows = jnp.pad(cand, (0, ng * GB - Np),
                   constant_values=jnp.int32(C)).reshape(ng, GB)
    svals = jnp.sort(rows, axis=1)
    valid = svals < C
    prev = jnp.concatenate(
        [jnp.full((ng, 1), -1, jnp.int32), svals[:, :-1]], axis=1)
    firsts = valid & (svals != prev)
    counts = jnp.sum(firsts, axis=1).astype(jnp.int32)
    keyed = jnp.where(firsts, svals, jnp.int32(1) << 20)
    vals = jnp.sort(keyed, axis=1)
    S = 2 * SL_WORDS
    if GB < S:
        vals = jnp.pad(vals, ((0, 0), (0, S - GB)),
                       constant_values=jnp.int32(1) << 20)
    idx = jnp.clip(vals[:, :S], 0, 0xffff)   # entries >= counts unread
    packed = idx[:, 0::2] | (idx[:, 1::2] << 16)
    eblk = jnp.full((ng, -(-S // EB_E)), -3e38, jnp.float32)
    return counts.reshape(1, ng), packed, eblk, G


def queue_closest_raw(scene, ray_o, ray_d, far0, packed_ids, more, K):
    """Per-ray candidate-queue closest hit: (t (N,), wid (N,) i32).

    Expects rays PRE-SORTED by the round-0 candidate key (ids[:,0]*8 +
    octant; see ops/intersect.py) so same-cluster rays share LANE_B
    tiles. Round r sweeps each tile-group's DISTINCT r'th candidates
    (chunk-gated visits; t_o starts at the previous round's t, so gates
    tighten between rounds and a winner exactly AT far stays recorded —
    same composition contract as the two-phase pass). Rays whose
    candidate queue was truncated (more: >K clusters entered before
    far0) finish through the exact tile-union pass with their tightened
    t as far; every cluster with entry below the final t is therefore
    visited by one of the stages, so the result is exact.

    vs cluster_closest_march (the r3 dead end): ONE dense (N, C) pass
    and ONE wavefront sort total, instead of MARCH_ROUNDS+2 dense passes
    and ~8 sorts — the fixed costs that lost the march its microbench
    win end-to-end.

    Reference behavior: tracer/path_tracer.py:338-422 (closest-hit
    contract); the decomposition has no reference analog."""
    N = ray_o.shape[0]
    C = scene.cl_aabb.shape[0]
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    pad_word = int(C | (C << 16))
    pk = jnp.pad(packed_ids, ((0, Np - N), (0, 0)),
                 constant_values=pad_word)
    t = far
    wid = jnp.full((Np, 1), -1, jnp.int32)
    for r in range(K):
        cand = _unpack_id(pk, r)
        lists = _round_lists(cand, Np, C)
        t, wid = _closest_sl_pass(scene, ro, rd, t, Np, wid, 0,
                                  lists=lists)
    morep = jnp.pad(more, (0, Np - N), constant_values=False)
    fs = jnp.where(morep[:, None], t, -3e38)
    t2, wid2 = _closest_sl_pass(scene, ro, rd, fs, Np, wid, 0)
    t = jnp.where(morep[:, None], t2, t)
    wid = jnp.where(morep[:, None], wid2, wid)
    return t[:N, 0], wid[:N, 0]


def _single_kernel(tri_only, pick_ref, ro_ref, rd_ref, far_ref, wid0_ref,
                   rows_hbm, t_o, wid_o, buf, sem):
    """Majority-round visit: tile i brute-tests exactly ONE cluster
    (pick_ref[0, i]; -1 = skip). No list iteration, no gates — the
    whole sweep scaffolding the union kernels pay per listed entry is
    gone; cost per active tile is one DMA + one fused brute test
    (both measured-free relative to the scaffolding)."""
    i = pl.program_id(0)
    t_o[:] = far_ref[:]
    wid_o[:] = wid0_ref[:]
    pick = pick_ref[0, i]

    @pl.when(pick >= 0)
    def _():
        _visit_cluster_deferred(pick, None, rows_hbm, buf, sem,
                                ro_ref[:], rd_ref[:], None, t_o, wid_o,
                                tri_only)


def _single_pass(scene, ro, rd, far, Np, wid0, picks):
    """One majority-round kernel pass over pre-blocked rays.

    picks: (1, nt) i32 cluster id per ray tile (-1 = inactive tile),
    delivered via scalar prefetch (8 KB SMEM at 512^2)."""
    C, F, CM = scene.cl_rows.shape
    grid = (Np // LANE_B,)
    ray = pl.BlockSpec((LANE_B, 3), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANE_B, 1), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    rows = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        functools.partial(_single_kernel, _tri_only(scene)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[ray, ray, col, col, rows],
            out_specs=[col, col],
            scratch_shapes=[pltpu.VMEM((F, CM), jnp.float32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.int32)],
        interpret=_INTERPRET,
    )(picks, ro, rd, far, wid0, scene.cl_rows)


def _queue_head(ids, ents, ptr, K, C):
    """Per-lane (id, entry) of the queue entry at ptr (C / +inf past
    the end). One-hot selects over the tiny K axis — no gathers."""
    sel = ptr[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
    cid = jnp.sum(jnp.where(sel, ids, 0), axis=1)
    ent = jnp.sum(jnp.where(sel, jnp.where(jnp.isfinite(ents), ents,
                                           3e38), 0.0), axis=1)
    past = ptr >= K
    return (jnp.where(past, jnp.int32(C), cid),
            jnp.where(past, jnp.float32(3e38), ent))


def majority_closest(scene, ray_o, ray_d, far0, R=None, K=None):
    """Majority-round closest hit: (t (N,), wid (N,) i32), ORIGINAL order.

    Each round: sort the wavefront by its front pending candidate
    (octant-tagged), let every tile visit its median lane's candidate
    (_single_pass — one DMA + one brute test, zero sweep scaffolding),
    then advance per-lane queue pointers past entries that were either
    tested by the lane's own tile or provably pruned (inflated-box
    entry >= current t_best, a sound lower bound on any hit t inside).
    Rays with pending entries after R rounds (or truncated queues,
    `more`) finish through the exact tile-union pass with far already
    tightened to their t_best — every cluster with entry below the
    final t is therefore visited by one of the stages, so the result
    is exact (same composition contract as queue_closest_raw).

    vs queue_closest_raw: per-GROUP distinct-candidate lists still pay
    one sweep step per distinct id per tile (mean 4.0/group measured);
    here covered tiles pay exactly one visit and no list machinery.

    Reference behavior: tracer/path_tracer.py:338-422 (closest-hit
    contract); the decomposition has no reference analog."""
    from .intersect import _sort_by
    R = MAJ_R if R is None else R
    K = MAJ_K if K is None else K
    C = scene.cl_aabb.shape[0]
    N = ray_o.shape[0]
    ids, ents, more = _topk_candidates(scene, ray_o, ray_d, far0, K)
    ents = jnp.where(jnp.isfinite(ents), ents, 3e38)
    octant = ((ray_d[:, 0] > 0).astype(jnp.int32)
              + 2 * (ray_d[:, 1] > 0).astype(jnp.int32)
              + 4 * (ray_d[:, 2] > 0).astype(jnp.int32))
    pos = jnp.arange(N, dtype=jnp.int32)
    ro, rd, t = ray_o, ray_d, far0
    wid = jnp.full((N,), -1, jnp.int32)
    ptr = jnp.zeros((N,), jnp.int32)
    more_i = more.astype(jnp.int32)
    for _r in range(R):
        cid, _ent = _queue_head(ids, ents, ptr, K, C)
        key = jnp.where(cid < C, cid * 8 + octant, 8 * C + 7)
        (ro, rd, t, wid, ids, ents, ptr, more_i, octant,
         pos) = _sort_by(key, [ro, rd, t, wid, ids, ents, ptr, more_i,
                               octant, pos], seg=0)
        cid, _ent = _queue_head(ids, ents, ptr, K, C)
        rob, rdb, tb, Np = _ray_blocks(ro, rd, t)
        nt = Np // LANE_B
        cid_b = jnp.pad(cid, (0, Np - N), constant_values=C)
        pick = cid_b.reshape(nt, LANE_B)[:, LANE_B // 2]
        pick = jnp.where(pick < C, pick, -1).astype(jnp.int32)
        widb = jnp.pad(wid.reshape(N, 1), ((0, Np - N), (0, 0)),
                       constant_values=-1)
        t2, wid2 = _single_pass(scene, rob, rdb, tb, Np, widb,
                                pick.reshape(1, nt))
        t, wid = t2[:N, 0], wid2[:N, 0]
        mypick = jnp.broadcast_to(pick[:, None],
                                  (nt, LANE_B)).reshape(Np)[:N]
        for _ in range(K):       # advance past tested / pruned entries
            cid, ent = _queue_head(ids, ents, ptr, K, C)
            adv = (ptr < K) & ((cid == mypick) | (ent >= t))
            ptr = ptr + adv.astype(jnp.int32)
    cid, ent = _queue_head(ids, ents, ptr, K, C)
    pending = (more_i > 0) | ((ptr < K) & (ent < t))
    fs = jnp.where(pending, t, -3e38)
    rob, rdb, fsb, Np = _ray_blocks(ro, rd, fs)
    widb = jnp.pad(wid.reshape(N, 1), ((0, Np - N), (0, 0)),
                   constant_values=-1)
    t3, wid3 = _closest_sl_pass(scene, rob, rdb, fsb, Np, widb, 0)
    t = jnp.where(pending, t3[:N, 0], t)
    wid = jnp.where(pending, wid3[:N, 0], wid)
    t, wid = _sort_by(pos, [t, wid], seg=0)
    return t, wid


def _front_kernel(C, ab_ref, ro_ref, rd_ref, far_ref, cid_o, nxt_o):
    """Per-lane front-most entered cluster, entirely in VMEM.

    ab_ref: (8, Cp) f32 — rows 0:3 inflated lo xyz, 3:6 inflated hi xyz
    (padding columns carry lo = hi = +3e38: for any axis with inv > 0
    the slab t's are huge positive so tn >= far fails the test, and
    with ALL inv < 0 they are huge negative so tf < ent fails — padded
    clusters are never candidates). Outputs per lane: cid_o — the
    front-most (minimum inflated-box entry, ties to the lowest id, the
    exact tie order of _topk_candidates) entered cluster id, C when the
    ray enters none — and nxt_o — the entry distance of the SECOND
    front-most entered cluster (3e38 when fewer than two), a sound
    lower bound on any prim-hit t outside the front cluster.

    Replaces the blockwise XLA (N, C) dense pass (_topk_candidates,
    measured 31.6 ms/call at 512^2 x C=1613): the whole AABB table
    lives in VMEM (8*Cp*4 B, 64 KB at Cp=2048) and each grid step does
    pure branch-free vector work, so the pass runs at VPU speed instead
    of materializing (N, C) HBM intermediates."""
    o = ro_ref[:]                                  # (B, 3)
    d = rd_ref[:]
    f = far_ref[:]                                 # (B, 1)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    Cp = ab_ref.shape[1]
    B = o.shape[0]
    tn = jnp.full((B, Cp), -3e38, jnp.float32)
    tf = jnp.full((B, Cp), 3e38, jnp.float32)
    for k in range(3):
        t1 = (ab_ref[k:k + 1, :] - o[:, k:k + 1]) * inv[:, k:k + 1]
        t2 = (ab_ref[k + 3:k + 4, :] - o[:, k:k + 1]) * inv[:, k:k + 1]
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
    ent = jnp.maximum(tn, 0.0)
    hit = (tf >= ent) & (tn < f)
    keyed = jnp.where(hit, ent, 3e38)
    lane = jax.lax.broadcasted_iota(jnp.int32, keyed.shape, 1)
    mt = jnp.min(keyed, axis=1, keepdims=True)             # (B, 1)
    has = mt < 3e38
    cid = jnp.min(jnp.where(keyed == mt, lane, Cp), axis=1,
                  keepdims=True)
    cid_o[:] = jnp.where(has, cid, C).astype(jnp.int32)
    rest = jnp.where(lane == cid, 3e38, keyed)
    nxt_o[:] = jnp.where(has, jnp.min(rest, axis=1, keepdims=True),
                         jnp.float32(3e38))


# VMEM ceiling for the front kernel's (LANE_B, Cp) intermediates: ~8
# live f32 buffers; at Cp = 4096 and B = 128 that is ~16 MB. Scenes
# beyond it take the jnp fallback.
_FRONT_MAX_CP = 4096 * 128 // LANE_B


def _front_candidates(scene, ray_o, ray_d, far0):
    """(cid (N,) i32, nxt (N,) f32) — see _front_kernel. Rays are padded
    to LANE_B blocks with dead far (no candidates). Falls back to the
    jnp topk pass when the cluster count exceeds the VMEM budget."""
    C = scene.cl_aabb.shape[0]
    N = ray_o.shape[0]
    Cp = -(-C // 128) * 128
    if Cp > _FRONT_MAX_CP:
        ids, ents, _more = _topk_candidates(scene, ray_o, ray_d, far0, 2)
        nxt = jnp.where(jnp.isfinite(ents[:, 1]), ents[:, 1], 3e38)
        return ids[:, 0], nxt
    ext = jnp.abs(scene.cl_aabb[:, 0:3]) + jnp.abs(scene.cl_aabb[:, 3:6]) \
        + 1.0
    lo = scene.cl_aabb[:, 0:3] - 1e-6 * ext
    hi = scene.cl_aabb[:, 3:6] + 1e-6 * ext
    tbl = jnp.concatenate([lo.T, hi.T,
                           jnp.zeros((2, C), jnp.float32)], axis=0)
    tbl = jnp.pad(tbl, ((0, 0), (0, Cp - C)), constant_values=3e38)
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    grid = (Np // LANE_B,)
    ray = pl.BlockSpec((LANE_B, 3), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANE_B, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    ab = pl.BlockSpec(memory_space=pltpu.VMEM)
    cid, nxt = pl.pallas_call(
        functools.partial(_front_kernel, C),
        grid=grid,
        in_specs=[ab, ray, ray, col],
        out_specs=[col, col],
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.float32)],
        interpret=_INTERPRET,
    )(tbl, ro, rd, far)
    return cid[:N, 0], nxt[:N, 0]


def _tile_picks(cid_sorted, Np, C, P):
    """Per-tile first-P DISTINCT candidate ids and per-lane coverage.

    cid_sorted: (Np,) i32, ascending WITHIN each LANE_B tile (the
    wavefront was just globally sorted by cid-keyed keys). Returns
    (picks [(nt,) i32, -1 = none] * P, covered (Np,) bool — the lane's
    own cid is among its tile's first P distinct values)."""
    nt = Np // LANE_B
    rows = cid_sorted.reshape(nt, LANE_B)
    valid = rows < C
    prev = jnp.concatenate(
        [jnp.full((nt, 1), -1, jnp.int32), rows[:, :-1]], axis=1)
    firsts = valid & (rows != prev)
    rank = jnp.cumsum(firsts.astype(jnp.int32), axis=1) - 1
    picks = []
    for p in range(P):
        sel = firsts & (rank == p)
        picks.append(jnp.max(jnp.where(sel, rows, -1),
                             axis=1).astype(jnp.int32))
    covered = (valid & (rank < P)).reshape(Np)
    return picks, covered


def qpick_closest(scene, ray_o, ray_d, far0, P=None):
    """Queue-pick closest hit: (t (N,), wid (N,) i32), ORIGINAL order.

    The per-ray-granularity redesign built from the measured fixed
    costs that made march (a487d99), queue (a776e3a) and majority
    (ddf0890) end-to-end neutral despite 2-2.6x kernel-side wins:

      1. ONE Pallas front-cluster pass (_front_kernel, AABBs resident
         in VMEM) replaces the 31.6 ms XLA dense (N, C) pass.
      2. ONE wavefront sort by (front cid, direction octant) packs
         same-cluster rays into LANE_B tiles (no per-round re-sorts —
         the majority design's death).
      3. P scalar-prefetch pick passes (_single_pass): each tile
         brute-tests its p'th distinct candidate — 1 visit/tile/pass
         with zero sweep scaffolding, vs _round_lists' G=4-tile groups
         sweeping a measured mean 4.0 distinct entries through the
         SMEM list machinery.
      4. Exact union cleanup with far already tightened, restricted to
         residual lanes: rank >= P within the tile, or a second
         entered cluster whose (inflated, hence sound lower-bound)
         entry is still below the lane's t_best.

    Exactness: a covered lane's front cluster is brute-tested in full;
    every other cluster it enters has entry >= nxt, so nxt >= t_best
    proves no closer hit exists outside it. All other lanes reach the
    union cleanup whose lists cover every cluster with entry < t_best.

    Reference behavior: tracer/path_tracer.py:338-422 (closest-hit
    contract); the decomposition has no reference analog."""
    from .intersect import _sort_by
    P = QP_P if P is None else P
    C = scene.cl_aabb.shape[0]
    N = ray_o.shape[0]
    cid0, nxt0 = _front_candidates(scene, ray_o, ray_d, far0)
    octant = ((ray_d[:, 0] > 0).astype(jnp.int32)
              + 2 * (ray_d[:, 1] > 0).astype(jnp.int32)
              + 4 * (ray_d[:, 2] > 0).astype(jnp.int32))
    key = jnp.where(cid0 < C, cid0 * 8 + octant, 8 * C + 7)
    pos0 = jnp.arange(N, dtype=jnp.int32)
    ro, rd, t, cid, nxt, pos = _sort_by(
        key, [ray_o, ray_d, far0, cid0, nxt0, pos0], seg=0)
    rob, rdb, tb, Np = _ray_blocks(ro, rd, t)
    nt = Np // LANE_B
    cid_b = jnp.pad(cid, (0, Np - N), constant_values=jnp.int32(C))
    picks, covered = _tile_picks(cid_b, Np, C, P)
    wid = jnp.full((Np, 1), -1, jnp.int32)
    for p in range(P):
        tb, wid = _single_pass(scene, rob, rdb, tb, Np, wid,
                               picks[p].reshape(1, nt))
    t1, wid1 = tb[:N, 0], wid[:N, 0]
    residual = (cid < C) & (jnp.logical_not(covered[:N])
                            | (nxt < t1))
    fs = jnp.where(residual, t1, -3e38)
    fsb = jnp.pad(fs.reshape(N, 1), ((0, Np - N), (0, 0)),
                  constant_values=-3e38)
    wb = jnp.pad(wid1.reshape(N, 1), ((0, Np - N), (0, 0)),
                 constant_values=-1)
    t2, wid2 = _closest_sl_pass(scene, rob, rdb, fsb, Np, wb, 0)
    t1 = jnp.where(residual, t2[:N, 0], t1)
    wid1 = jnp.where(residual, wid2[:N, 0], wid1)
    t, wid = _sort_by(pos, [t1, wid1], seg=0)
    return t, wid


def _single_any_kernel(tri_only, pick_ref, ro_ref, rd_ref, far_ref,
                       rows_hbm, occ_o, buf, sem):
    """Any-hit pick visit: tile i brute-tests exactly ONE cluster."""
    i = pl.program_id(0)
    occ_o[:] = jnp.zeros_like(occ_o[:])
    pick = pick_ref[0, i]

    @pl.when(pick >= 0)
    def _():
        _visit_cluster_any_gateless(pick, rows_hbm, buf, sem, ro_ref[:],
                                    rd_ref[:], far_ref, occ_o, tri_only)


def _any_sl_pass(scene, ro, rd, far, Np):
    """One shortlist-kernel any-hit pass over pre-blocked rays
    (extracted from cluster_any_hit so qpick_any can reuse it)."""
    C, F, CM = scene.cl_rows.shape
    counts, packed, eblk, G = _tile_shortlists(scene.cl_aabb, ro, rd,
                                               far)
    grid, in_specs, out1, _out3 = _specs(Np, shortlist=True)
    return pl.pallas_call(
        functools.partial(_any_sl_kernel, _tri_only(scene), G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out1,
            scratch_shapes=[pltpu.VMEM((F, CM), jnp.float32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.bool_),
        interpret=_INTERPRET,
    )(counts, packed, eblk, ro, rd, far, scene.cl_chunk, scene.cl_rows)


def qpick_any(scene, ray_o, ray_d, far0, P=None):
    """Queue-pick any-hit: occluded (N,) bool, ORIGINAL order.

    Same pipeline as qpick_closest (front pass, one sort, P pick
    passes, union cleanup) with occlusion accumulation instead of t
    tightening. A covered unoccluded lane with no second entered
    cluster (nxt = 3e38) is a settled miss; everything else that
    entered a cluster and is not yet occluded takes the exact union
    pass. Occluded lanes get dead far (-3e38) in the cleanup so their
    groups never sweep.

    Reference behavior: emitters' shadow-ray occlusion test,
    tracer/path_tracer.py:338-422."""
    from .intersect import _sort_by
    P = QP_P if P is None else P
    C = scene.cl_aabb.shape[0]
    N = ray_o.shape[0]
    cid0, nxt0 = _front_candidates(scene, ray_o, ray_d, far0)
    octant = ((ray_d[:, 0] > 0).astype(jnp.int32)
              + 2 * (ray_d[:, 1] > 0).astype(jnp.int32)
              + 4 * (ray_d[:, 2] > 0).astype(jnp.int32))
    key = jnp.where(cid0 < C, cid0 * 8 + octant, 8 * C + 7)
    pos0 = jnp.arange(N, dtype=jnp.int32)
    ro, rd, far, cid, nxt, pos = _sort_by(
        key, [ray_o, ray_d, far0, cid0, nxt0, pos0], seg=0)
    rob, rdb, farb, Np = _ray_blocks(ro, rd, far)
    nt = Np // LANE_B
    cid_b = jnp.pad(cid, (0, Np - N), constant_values=jnp.int32(C))
    picks, covered = _tile_picks(cid_b, Np, C, P)
    grid = (nt,)
    ray = pl.BlockSpec((LANE_B, 3), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANE_B, 1), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    rows = pl.BlockSpec(memory_space=pl.ANY)
    CC, F, CM = scene.cl_rows.shape
    occ = jnp.zeros((Np, 1), jnp.bool_)
    for p in range(P):
        occ_p = pl.pallas_call(
            functools.partial(_single_any_kernel, _tri_only(scene)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[ray, ray, col, rows],
                out_specs=col,
                scratch_shapes=[pltpu.VMEM((F, CM), jnp.float32),
                                pltpu.SemaphoreType.DMA(())]),
            out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.bool_),
            interpret=_INTERPRET,
        )(picks[p].reshape(1, nt), rob, rdb, farb, scene.cl_rows)
        occ = occ | occ_p
    occ1 = occ[:N, 0]
    residual = (cid < C) & jnp.logical_not(occ1) \
        & (jnp.logical_not(covered[:N]) | (nxt < 3e38))
    fs = jnp.where(residual, far, -3e38)
    fsb = jnp.pad(fs.reshape(N, 1), ((0, Np - N), (0, 0)),
                  constant_values=-3e38)
    occ2 = _any_sl_pass(scene, rob, rdb, fsb, Np)
    occ1 = occ1 | (residual & occ2[:N, 0])
    (occ1,) = _sort_by(pos, [occ1.astype(jnp.int32)], seg=0)
    return occ1 > 0


def cluster_closest_hit(scene, ray_o, ray_d, far0):
    """Closest hit through the cluster decomposition.

    Returns (t, gid, u, v, n_g, obj) — gid/obj = -1, t = far0, n_g=(1,0,0)
    on miss. Float fields match the jnp cursor walk up to FMA rounding."""
    if SHORTLIST:
        t, wid = cluster_closest_raw(scene, ray_o, ray_d, far0)
        gid, u, v, ng, obj = _resolve_winner(scene, wid, t, ray_o, ray_d)
        return t, gid, u, v, ng, obj
    N = ray_o.shape[0]
    C, F, CM = scene.cl_rows.shape
    Cp = scene.cl_aabb_t.shape[1]
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    out_shape = [jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                 jax.ShapeDtypeStruct((Np, 1), jnp.int32),
                 jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                 jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                 jax.ShapeDtypeStruct((Np, 3), jnp.float32),
                 jax.ShapeDtypeStruct((Np, 1), jnp.int32),
                 jax.ShapeDtypeStruct((Np, 1), jnp.int32)]
    order = _tile_cluster_order(scene.cl_aabb, ro, rd)
    grid, in_specs, out1, out3 = _specs(Np)
    t, gid, u, v, ng, obj, sph = pl.pallas_call(
        functools.partial(_closest_kernel, _tri_only(scene)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[out1, out1, out1, out1, out3, out1, out1],
            scratch_shapes=[pltpu.VMEM((F, CM), jnp.float32),
                            pltpu.VMEM((8, Cp), jnp.float32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(order, ro, rd, far, scene.cl_aabb_t, scene.cl_chunk,
      scene.cl_rows)
    ng = ng[:N]
    # spherical uv from the (already final) sphere normal
    # (reference tracer_base.py:226-231 formulas)
    is_sph = sph[:N, 0] > 0
    sph_u = (jnp.arctan2(ng[:, 1], ng[:, 0]) + jnp.pi) / (2.0 * jnp.pi)
    sph_v = jnp.arccos(jnp.clip(ng[:, 2], -1.0, 1.0)) / jnp.pi
    u = jnp.where(is_sph, sph_u, u[:N, 0])
    v = jnp.where(is_sph, sph_v, v[:N, 0])
    return t[:N, 0], gid[:N, 0], u, v, ng, obj[:N, 0]


def cluster_any_hit(scene, ray_o, ray_d, far0):
    """True where any prim lies strictly before far0."""
    if SHORTLIST and QPICK:
        return qpick_any(scene, ray_o, ray_d, far0)
    N = ray_o.shape[0]
    C, F, CM = scene.cl_rows.shape
    Cp = scene.cl_aabb_t.shape[1]
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    if SHORTLIST:
        occ = _any_sl_pass(scene, ro, rd, far, Np)
        return occ[:N, 0]
    order = _tile_cluster_order(scene.cl_aabb, ro, rd)
    grid, in_specs, out1, _out3 = _specs(Np)
    occ = pl.pallas_call(
        functools.partial(_any_kernel, _tri_only(scene)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out1,
            scratch_shapes=[pltpu.VMEM((F, CM), jnp.float32),
                            pltpu.VMEM((8, Cp), jnp.float32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.bool_),
        interpret=_INTERPRET,
    )(order, ro, rd, far, scene.cl_aabb_t, scene.cl_chunk, scene.cl_rows)
    return occ[:N, 0]
