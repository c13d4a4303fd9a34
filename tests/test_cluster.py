"""Pallas cluster intersector == jnp cursor BVH walk (big-scene path).

Runs the cluster kernel in interpret mode on a 2k-tri knot + sphere scene
(scenes/cbox/knot2k-test.xml, generated fixture) and checks hit ids match
the cursor walk exactly, floats to ~1 ULP. Covers closest-hit, sphere
rows (in-kernel spherical uv/normal finalization), max_t-clipped any-hit,
and the compile-time cluster cut's coverage invariants.
"""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import SCENE_DIR

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "gen_procedural.py")],
                   check=True)
    from adapt_tpu.ops import cluster_pallas
    old = cluster_pallas._INTERPRET
    cluster_pallas._INTERPRET = True
    yield
    cluster_pallas._INTERPRET = old


@pytest.fixture(scope="module")
def knot():
    from adapt_tpu.scene.compile import load_scene
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "knot2k-test.xml")
    cfg = dataclasses.replace(
        cfg, w=24, h=24, focal=cfg.focal * 24 / 512, end_x=24, end_y=24,
        anti_alias=False, stratified_sampling=False)
    assert scene.cl_rows.shape[0] > 1          # really clustered
    return scene, cfg


def _rays(scene, cfg, key):
    from adapt_tpu.renderer.base import camera_rays
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    k1, k2 = jax.random.split(key)
    t = jax.random.uniform(k1, (ro.shape[0], 1), minval=0.2, maxval=3.0)
    o2 = ro + rd * t
    d2 = jax.random.normal(k2, rd.shape)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    return jnp.concatenate([ro, o2], 0), jnp.concatenate([rd, d2], 0)


def test_cluster_cut_covers_all_prims(knot):
    scene, _ = knot
    gids = np.asarray(scene.cl_rows[:, 13, :]).reshape(-1)
    got = np.sort(gids[gids >= 0].astype(np.int64))
    P = np.asarray(scene.prim_obj).shape[0]
    assert got.size == P                       # disjoint exact cover
    assert (got == np.arange(P)).all()


@pytest.fixture(params=[True, False], ids=["shortlist", "legacy"])
def sweep_mode(request):
    """Cover both sweep paths: SMEM shortlists (default) and the
    all-clusters masked sweep (ADAPT_SHORTLIST=0 fallback)."""
    from adapt_tpu.ops import cluster_pallas
    old = cluster_pallas.SHORTLIST
    cluster_pallas.SHORTLIST = request.param
    yield
    cluster_pallas.SHORTLIST = old


def test_cluster_closest_matches_cursor(knot, sweep_mode):
    scene, cfg = knot
    from adapt_tpu.ops.intersect import ray_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(7))
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd)
    got = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=True),
                        ro, rd)
    assert (np.asarray(got.prim_id) == np.asarray(ref.prim_id)).all()
    assert (np.asarray(got.obj_id) == np.asarray(ref.obj_id)).all()
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=2e-6)
    # near-zero barycentrics cancel ~1e2-magnitude dot products, so the
    # absolute floor is a few ULP of the operands, not of the result
    np.testing.assert_allclose(np.asarray(got.uv), np.asarray(ref.uv),
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.n_g), np.asarray(ref.n_g),
                               rtol=2e-5, atol=2e-6)


def test_cluster_any_hit_matches_cursor(knot, sweep_mode):
    scene, cfg = knot
    from adapt_tpu.ops.intersect import does_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(9))
    for max_t in (None, jnp.full((ro.shape[0],), 2.0, jnp.float32)):
        ref = does_intersect(scene,
                             dataclasses.replace(cfg, use_cluster=False),
                             ro, rd, max_t)
        got = does_intersect(scene,
                             dataclasses.replace(cfg, use_cluster=True),
                             ro, rd, max_t)
        assert (np.asarray(got) == np.asarray(ref)).all()


def test_cluster_two_phase_matches_single_pass(knot):
    """The two-phase closest sweep (capped phase 1 -> far-tightened
    phase 2) is exact: results match the single-pass sweep and the
    cursor walk for any PH1_CAP, including a 1-candidate phase 1.
    MARCH is pinned off: this covers the legacy tile-union path."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(17))
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd)
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    old_tp, old_cap, old_m = cp.TWO_PHASE, cp.PH1_CAP, cp.MARCH
    try:
        cp.MARCH = False
        for tp, cap in ((False, 0), (True, 1), (True, 4)):
            cp.TWO_PHASE, cp.PH1_CAP = tp, cap
            got = ray_intersect(scene, ccfg, ro, rd)
            assert (np.asarray(got.prim_id)
                    == np.asarray(ref.prim_id)).all(), (tp, cap)
            np.testing.assert_allclose(np.asarray(got.t),
                                       np.asarray(ref.t), rtol=2e-6)
    finally:
        cp.TWO_PHASE, cp.PH1_CAP, cp.MARCH = old_tp, old_cap, old_m


def test_cluster_march_rounds_exact(knot):
    """The per-ray front-to-back march is exact for ANY round budget:
    0 (cleanup-only = plain tile-union pass), 1 (front-most candidate +
    cleanup), and 3 (most rays finish in-rounds; the cleanup tail is
    near-empty). Includes max_t clipping and alive-mask forced misses."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(23))
    N = ro.shape[0]
    max_t = jnp.where(jax.random.uniform(jax.random.PRNGKey(2), (N,)) < .5,
                      2.0, -1.0)
    alive = jax.random.uniform(jax.random.PRNGKey(4), (N,)) < 0.8
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd, max_t=max_t)
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    a = np.asarray(alive)
    old = cp.MARCH_ROUNDS
    try:
        for r in (0, 1, 3):
            cp.MARCH_ROUNDS = r
            got = ray_intersect(scene, ccfg, ro, rd, max_t=max_t,
                                alive=alive)
            assert (np.asarray(got.prim_id)[a]
                    == np.asarray(ref.prim_id)[a]).all(), r
            assert (np.asarray(got.obj_id)[~a] == -1).all(), r
            np.testing.assert_allclose(np.asarray(got.t)[a],
                                       np.asarray(ref.t)[a], rtol=2e-6)
    finally:
        cp.MARCH_ROUNDS = old


def test_cluster_queue_exact(knot):
    """The per-ray candidate-queue closest hit (ADAPT_QUEUE path) is
    exact for ANY K: K=1 (front-most candidate + cleanup carries the
    rest), K=2 and K=6 (cleanup tail near-empty). Includes max_t
    clipping and alive-mask forced misses; also checks the truncation
    flag logic by comparing kernel winners against the cursor walk."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(29))
    N = ro.shape[0]
    max_t = jnp.where(jax.random.uniform(jax.random.PRNGKey(3), (N,)) < .5,
                      2.0, -1.0)
    alive = jax.random.uniform(jax.random.PRNGKey(5), (N,)) < 0.8
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd, max_t=max_t)
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    a = np.asarray(alive)
    old_q, old_k = cp.QUEUE, cp.QUEUE_K
    try:
        cp.QUEUE = True
        for k in (1, 2, 6):
            cp.QUEUE_K = k
            got = ray_intersect(scene, ccfg, ro, rd, max_t=max_t,
                                alive=alive)
            assert (np.asarray(got.prim_id)[a]
                    == np.asarray(ref.prim_id)[a]).all(), k
            assert (np.asarray(got.obj_id)[~a] == -1).all(), k
            np.testing.assert_allclose(np.asarray(got.t)[a],
                                       np.asarray(ref.t)[a], rtol=2e-6)
    finally:
        cp.QUEUE, cp.QUEUE_K = old_q, old_k


def test_cluster_majority_exact(knot):
    """The majority-round closest hit (ADAPT_MAJ path) is exact for any
    (R, K): every cluster with entry below the final t is visited either
    by a tile pick, pruned by a sound entry>=t bound, or swept by the
    far-tightened union cleanup. Includes max_t clipping and alive-mask
    forced misses (R=0 degenerates to pure cleanup = the baseline)."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(31))
    N = ro.shape[0]
    max_t = jnp.where(jax.random.uniform(jax.random.PRNGKey(4), (N,)) < .5,
                      2.0, -1.0)
    alive = jax.random.uniform(jax.random.PRNGKey(6), (N,)) < 0.8
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd, max_t=max_t)
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    a = np.asarray(alive)
    old_m, old_r, old_k = cp.MAJ, cp.MAJ_R, cp.MAJ_K
    try:
        cp.MAJ = True
        for r, k in ((0, 4), (1, 1), (2, 4), (3, 2)):
            cp.MAJ_R, cp.MAJ_K = r, k
            got = ray_intersect(scene, ccfg, ro, rd, max_t=max_t,
                                alive=alive)
            assert (np.asarray(got.prim_id)[a]
                    == np.asarray(ref.prim_id)[a]).all(), (r, k)
            assert (np.asarray(got.obj_id)[~a] == -1).all(), (r, k)
            np.testing.assert_allclose(np.asarray(got.t)[a],
                                       np.asarray(ref.t)[a], rtol=2e-6)
    finally:
        cp.MAJ, cp.MAJ_R, cp.MAJ_K = old_m, old_r, old_k


def test_cluster_qpick_exact(knot):
    """The queue-pick closest hit (ADAPT_QPICK path) is exact for any P:
    a covered lane's front cluster is brute-tested in full and its
    second entry bounds every other cluster; all other lanes finish
    through the far-tightened union cleanup. Includes max_t clipping and
    alive-mask forced misses. P=0 degenerates to pure cleanup."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(33))
    N = ro.shape[0]
    max_t = jnp.where(jax.random.uniform(jax.random.PRNGKey(5), (N,)) < .5,
                      2.0, -1.0)
    alive = jax.random.uniform(jax.random.PRNGKey(9), (N,)) < 0.8
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd, max_t=max_t)
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    a = np.asarray(alive)
    old = cp.QPICK, cp.QP_P
    try:
        cp.QPICK = True
        for p in (0, 1, 2, 3):
            cp.QP_P = p
            got = ray_intersect(scene, ccfg, ro, rd, max_t=max_t,
                                alive=alive)
            assert (np.asarray(got.prim_id)[a]
                    == np.asarray(ref.prim_id)[a]).all(), p
            assert (np.asarray(got.obj_id)[~a] == -1).all(), p
            np.testing.assert_allclose(np.asarray(got.t)[a],
                                       np.asarray(ref.t)[a], rtol=2e-6)
    finally:
        cp.QPICK, cp.QP_P = old


def test_cluster_qpick_any_exact(knot):
    """qpick_any == the baseline union any-hit for any P, incl. max_t
    and alive masks (dead lanes return unoccluded)."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import does_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(41))
    N = ro.shape[0]
    max_t = jnp.where(jax.random.uniform(jax.random.PRNGKey(8), (N,)) < .5,
                      2.0, -1.0)
    alive = jax.random.uniform(jax.random.PRNGKey(11), (N,)) < 0.8
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    ref = does_intersect(scene, ccfg, ro, rd, max_t=max_t, alive=alive)
    a = np.asarray(alive)
    old = cp.QPICK, cp.QP_P
    try:
        cp.QPICK = True
        for p in (0, 1, 2):
            cp.QP_P = p
            got = does_intersect(scene, ccfg, ro, rd, max_t=max_t,
                                 alive=alive)
            assert (np.asarray(got) == np.asarray(ref)).all(), p
            assert not np.asarray(got)[~a].any(), p
    finally:
        cp.QPICK, cp.QP_P = old


def test_cluster_shortlist_overflow_fallback(knot):
    """Groups whose shortlist exceeds S=2*SL_WORDS entries take the
    chunk-gated all-cluster overflow sweep. Force S tiny so every group
    overflows and check both kernels still match the cursor walk."""
    scene, cfg = knot
    from adapt_tpu.ops import cluster_pallas as cp
    from adapt_tpu.ops.intersect import ray_intersect, does_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(13))
    old = cp.SL_WORDS
    cp.SL_WORDS = 1                       # S = 2 entries
    try:
        rob, rdb, far, _ = cp._ray_blocks(
            ro, rd, jnp.full((ro.shape[0],), cp.FAR, jnp.float32))
        counts, _, _, _ = cp._tile_shortlists(scene.cl_aabb, rob, rdb, far)
        assert (np.asarray(counts) > 2 * cp.SL_WORDS).any()   # really over
        ref = ray_intersect(
            scene, dataclasses.replace(cfg, use_cluster=False), ro, rd)
        got = ray_intersect(
            scene, dataclasses.replace(cfg, use_cluster=True), ro, rd)
        assert (np.asarray(got.prim_id) == np.asarray(ref.prim_id)).all()
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                                   rtol=2e-6)
        occ_ref = does_intersect(
            scene, dataclasses.replace(cfg, use_cluster=False), ro, rd)
        occ = does_intersect(
            scene, dataclasses.replace(cfg, use_cluster=True), ro, rd)
        assert (np.asarray(occ) == np.asarray(occ_ref)).all()
    finally:
        cp.SL_WORDS = old


def test_cluster_alive_culling(knot):
    """alive=False lanes are forced misses; alive lanes match the cursor
    walk exactly (the culled wavefront is re-sorted, so this also covers
    the multi-operand lax.sort reorder path)."""
    scene, cfg = knot
    from adapt_tpu.ops.intersect import ray_intersect, does_intersect
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(11))
    N = ro.shape[0]
    alive = jax.random.uniform(jax.random.PRNGKey(3), (N,)) < 0.6
    ccfg = dataclasses.replace(cfg, use_cluster=True)
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_cluster=False),
                        ro, rd)
    got = ray_intersect(scene, ccfg, ro, rd, alive=alive)
    a = np.asarray(alive)
    assert (np.asarray(got.obj_id)[~a] == -1).all()
    assert (np.asarray(got.prim_id)[a] == np.asarray(ref.prim_id)[a]).all()
    np.testing.assert_allclose(np.asarray(got.t)[a], np.asarray(ref.t)[a],
                               rtol=2e-6)
    occ_ref = does_intersect(scene,
                             dataclasses.replace(cfg, use_cluster=False),
                             ro, rd)
    occ = does_intersect(scene, ccfg, ro, rd, alive=alive)
    assert not np.asarray(occ)[~a].any()
    assert (np.asarray(occ)[a] == np.asarray(occ_ref)[a]).all()


def test_intersect_pair_matches_separate_calls(knot):
    """The fused shadow+continuation intersect (one wavefront sort) is
    bit-identical to the separate does_intersect + ray_intersect calls
    on the cluster tier, including dead-lane forced misses."""
    scene, cfg = knot
    from adapt_tpu.ops.intersect import (ray_intersect, does_intersect,
                                         intersect_pair)
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(21))
    N = ro.shape[0]
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    d_shadow = jax.random.normal(k1, rd.shape)
    d_shadow = d_shadow / jnp.linalg.norm(d_shadow, axis=-1, keepdims=True)
    sfar = jax.random.uniform(k2, (N,), minval=0.5, maxval=4.0)
    alive = jax.random.uniform(k3, (N,)) < 0.7
    ccfg = dataclasses.replace(cfg, use_cluster=True)

    occ_ref = does_intersect(scene, ccfg, ro, d_shadow, sfar, alive=alive)
    it_ref = ray_intersect(scene, ccfg, ro, rd, alive=alive)
    occ, it = intersect_pair(scene, ccfg, ro, d_shadow, sfar, rd,
                             alive=alive)
    assert (np.asarray(occ) == np.asarray(occ_ref)).all()
    assert (np.asarray(it.prim_id) == np.asarray(it_ref.prim_id)).all()
    assert (np.asarray(it.obj_id) == np.asarray(it_ref.obj_id)).all()
    np.testing.assert_allclose(np.asarray(it.t), np.asarray(it_ref.t),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(it.uv), np.asarray(it_ref.uv),
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(it.n_g), np.asarray(it_ref.n_g),
                               rtol=2e-5, atol=2e-6)

    # the qpick branch of the pair (no fused outer sort) stays exact
    from adapt_tpu.ops import cluster_pallas as cp
    old = cp.QPICK
    try:
        cp.QPICK = True
        occ_q, it_q = intersect_pair(scene, ccfg, ro, d_shadow, sfar, rd,
                                     alive=alive)
    finally:
        cp.QPICK = old
    assert (np.asarray(occ_q) == np.asarray(occ_ref)).all()
    assert (np.asarray(it_q.prim_id) == np.asarray(it_ref.prim_id)).all()
    np.testing.assert_allclose(np.asarray(it_q.t), np.asarray(it_ref.t),
                               rtol=2e-6)
