"""K-hit interface extraction vs the sequential restart walk.

ray_k_hits (one Pallas pass + merged sphere roots) must reproduce the
hit SEQUENCE a restart-from-the-hit-point walk realizes: same global
distances, same object ids, same enter/exit sides. The restart oracle is
built from ray_intersect's exact jnp scan tier (use_pallas=False), the
path every estimator test already validates against numpy oracles.

track_ray's batched K-hit media walk must then match the sequential
while-loop walk (kept as the non-Pallas tier) on the shipped vpt scene:
same transmittance, same ior-weighted propagation time.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.ops import intersect_pallas
from adapt_tpu.ops.intersect import ray_intersect, ray_k_hits, FAR, RAY_EPS
from adapt_tpu.renderer import vpt as vpt_mod
from adapt_tpu.renderer.vpt import track_ray

from conftest import SCENE_DIR

K = 7


@pytest.fixture(autouse=True)
def interpret_mode():
    old = intersect_pallas._INTERPRET
    intersect_pallas._INTERPRET = True
    yield
    intersect_pallas._INTERPRET = old


def _rand_rays(scene, n, seed):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.obj_aabb_min).min(0)
    hi = np.asarray(scene.obj_aabb_max).max(0)
    o = rng.uniform(lo - 0.1 * (hi - lo), hi + 0.1 * (hi - lo),
                    (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _restart_oracle(scene, cfg, ro, rd, max_t):
    """Sequential restart walk on the exact jnp tier -> (t, obj, enter)."""
    cfg = dataclasses.replace(cfg, use_pallas=False)
    n = ro.shape[0]
    p = ro
    t_cum = np.zeros(n, np.float32)
    remaining = np.asarray(max_t).copy()
    alive = np.ones(n, bool)
    ts = np.full((K, n), np.float32(FAR))
    objs = np.full((K, n), -1, np.int32)
    enters = np.zeros((K, n), bool)
    for k in range(K):
        it = ray_intersect(scene, cfg, p, rd,
                           max_t=jnp.asarray(remaining))
        hit = np.asarray(it.is_hit) & alive
        t = np.asarray(it.t)
        ts[k, hit] = (t_cum + t)[hit]
        objs[k, hit] = np.asarray(it.obj_id)[hit]
        dn = np.asarray(jnp.sum(it.n_g * rd, axis=-1))
        enters[k, hit] = dn[hit] < 0.0
        p = p + rd * t[:, None]
        t_cum = t_cum + np.where(hit, t, 0.0)
        remaining = remaining - np.where(hit, t, 0.0)
        alive &= hit
    return ts, objs, enters


@pytest.mark.parametrize("scene_path", [("cbox", "cbox.xml"),
                                        ("csphere", "single-ball.xml")])
def test_ray_k_hits_matches_sequential_restarts(scene_path):
    folder, xml = scene_path
    scene, cfg, _ = load_scene(SCENE_DIR + f"/{folder}/", xml)
    cfg = dataclasses.replace(cfg, use_pallas=True)
    ro, rd = _rand_rays(scene, 64, seed=3)
    max_t = jnp.full((64,), 50.0)

    tk, objk, dnk = ray_k_hits(scene, cfg, ro, rd, max_t, K=K)
    tk, objk, dnk = map(np.asarray, (tk, objk, dnk))
    t_ref, obj_ref, ent_ref = _restart_oracle(scene, cfg, ro, rd, max_t)

    valid = tk < FAR * 0.5
    valid_ref = t_ref < FAR * 0.5
    # drop lanes where acceptance is legitimately rounding-dependent:
    # hits within 4 eps of the far clip, or consecutive separations in
    # the gray band between the chain's 0.5-eps margin and the restart
    # walk's 1.0-eps margin (the two measure the gap differently)
    safe = np.ones(64, bool)
    for k in range(K):
        near_far = np.abs(tk[k] - (np.asarray(max_t) - RAY_EPS)) < 4 * RAY_EPS
        near_ref = np.abs(t_ref[k] - (np.asarray(max_t) - RAY_EPS)) \
            < 4 * RAY_EPS
        safe &= ~(near_far | near_ref)
        if k > 0:
            for seq in (tk, t_ref):
                sep = seq[k] - seq[k - 1]
                gray = (sep > 0.25 * RAY_EPS) & (sep < 1.5 * RAY_EPS)
                safe &= ~((seq[k] < FAR * 0.5) & gray)
    assert safe.sum() > 32  # the filter must not hollow out the test
    assert (valid[:, safe] == valid_ref[:, safe]).all()
    m = valid & valid_ref & safe[None, :]
    np.testing.assert_allclose(tk[m], t_ref[m], rtol=1e-4, atol=1e-4)
    assert (objk[m] == obj_ref[m]).all()
    assert ((dnk[m] < 0.0) == ent_ref[m]).all()


def test_track_ray_khit_matches_loop(monkeypatch):
    scene, cfg, _ = load_scene(SCENE_DIR + "/vpt/", "cbox.xml")
    ro, rd = _rand_rays(scene, 128, seed=7)
    depth = jnp.full((128,), 6.0)
    active = jnp.asarray(np.arange(128) % 5 != 0)

    monkeypatch.setattr(vpt_mod, "_KHIT", True)
    cfg_k = dataclasses.replace(cfg, use_pallas=True)
    tr_k, acc_k = track_ray(scene, cfg_k, ro, rd, depth, active=active)

    cfg_l = dataclasses.replace(cfg, use_pallas=False)
    tr_l, acc_l = track_ray(scene, cfg_l, ro, rd, depth, active=active)

    a = np.asarray(active)
    np.testing.assert_allclose(np.asarray(tr_k)[a], np.asarray(tr_l)[a],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_k)[a], np.asarray(acc_l)[a],
                               rtol=1e-4, atol=1e-5)


def test_track_khit_overflow_falls_back(monkeypatch):
    """With K forced to 1 (as if the scene had no null objects), lanes
    crossing the null box's 2 interfaces overflow the extraction and
    must re-walk through the exact sequential loop — results must still
    match the pure-loop path bit-for-tolerance."""
    scene, cfg, _ = load_scene(SCENE_DIR + "/vpt/", "cbox.xml")
    ro, rd = _rand_rays(scene, 128, seed=11)
    depth = jnp.full((128,), 6.0)

    monkeypatch.setattr(vpt_mod, "_KHIT", True)
    cfg_k = dataclasses.replace(cfg, use_pallas=True, n_null_objs=0)
    tr_k, acc_k = track_ray(scene, cfg_k, ro, rd, depth)

    cfg_l = dataclasses.replace(cfg, use_pallas=False)
    tr_l, acc_l = track_ray(scene, cfg_l, ro, rd, depth)

    # sanity: the forced-K=1 run must actually exercise the overflow
    from adapt_tpu.ops.intersect import ray_track_hits
    *_n, ovf = ray_track_hits(scene, cfg_k, ro, rd, depth, K=1)
    assert bool(np.asarray(ovf).any())

    np.testing.assert_allclose(np.asarray(tr_k), np.asarray(tr_l),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_l),
                               rtol=1e-4, atol=1e-5)
