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


def _cube_obj(x0, x1, y0=0.0, y1=1.0, z0=0.0, z1=1.0):
    """Axis-aligned box OBJ text with outward-facing windings."""
    vs = [(x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
          (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)]
    # quads listed CCW viewed from outside
    quads = [(1, 2, 3, 4)[::-1],   # z=z0, normal -z
             (5, 6, 7, 8),         # z=z1, normal +z
             (1, 5, 8, 4),         # x=x0, normal -x
             (2, 3, 7, 6),         # x=x1, normal +x
             (1, 2, 6, 5),         # y=y0, normal -y
             (4, 8, 7, 3)]         # y=y1, normal +y
    lines = [f"v {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}" for v in vs]
    for a, b, c, d in quads:
        lines.append(f"f {a} {b} {c}")
        lines.append(f"f {a} {c} {d}")
    txt = "\n".join(lines) + "\n"
    # verify windings face outward
    import numpy as _np
    v = _np.asarray(vs)
    ctr = v.mean(0)
    for a, b, c, d in quads:
        n = _np.cross(v[b - 1] - v[a - 1], v[c - 1] - v[a - 1])
        assert _np.dot(n, v[a - 1] - ctr) > 0
    return txt


_EPS_XML = """<?xml version='1.0' encoding='utf-8'?>
<scene version="1.1">
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <integer name="sample_count" value="1"/>
    <integer name="max_bounce" value="4"/>
    <transform name="toWorld">
      <lookat target="1.5, 0.5, 0.5" origin="-2, 0.5, 0.5" up="0, 1, 0"/>
    </transform>
    <film type="film">
      <integer name="width" value="8"/>
      <integer name="height" value="8"/>
    </film>
  </sensor>
  <bsdf type="null" id="medA">
    <medium type="hg">
      <rgb name="u_a" value="0.7"/>
      <rgb name="u_s" value="0.9"/>
      <rgb name="par" value="0.0"/>
      <float name="ior" value="1.0"/>
    </medium>
  </bsdf>
  <bsdf type="null" id="medB">
    <medium type="hg">
      <rgb name="u_a" value="0.2"/>
      <rgb name="u_s" value="1.6"/>
      <rgb name="par" value="0.0"/>
      <float name="ior" value="1.2"/>
    </medium>
  </bsdf>
  <emitter type="point" id="point">
    <rgb name="emission" value="10.0, 10.0, 10.0"/>
    <point name="center" x="0.5" y="3.0" z="0.5"/>
  </emitter>
  <shape type="obj">
    <string name="filename" value="boxA.obj"/>
    <ref type="material" id="medA"/>
  </shape>
  <shape type="obj">
    <string name="filename" value="boxB.obj"/>
    <ref type="material" id="medB"/>
  </shape>
  <world name="w">
    <rgb name="skybox" value="0.0"/>
    <rgb name="ambient" value="0.0"/>
  </world>
</scene>
"""


def test_track_khit_eps_layered_nulls(tmp_path, monkeypatch):
    """Null interfaces layered at exactly RAY_EPS (the convention the
    CHAIN_SEP comment cites: adjacent surfaces 1e-4 apart, as in the vpt
    cbox null box 1e-4 above the floor). The khit chain accepts the
    second interface with CHAIN_SEP = 0.5*RAY_EPS headroom; the
    sequential restart walk accepts it at t' ~ RAY_EPS. Both must agree
    on transmittance and propagation time, or a scene near the half-eps
    boundary silently double-counts an interface (ADVICE r4 #1)."""
    (tmp_path / "boxA.obj").write_text(_cube_obj(0.0, 1.0))
    (tmp_path / "boxB.obj").write_text(_cube_obj(1.0 + RAY_EPS, 2.0))
    (tmp_path / "scene.xml").write_text(_EPS_XML)
    scene, cfg, _ = load_scene(str(tmp_path), "scene.xml")
    assert cfg.n_null_objs == 2

    # rays straight through both boxes (the x=1.0 / x=1.0+RAY_EPS pair),
    # plus slightly tilted ones so the gap is crossed at varied angles
    n = 64
    rng = np.random.default_rng(23)
    o = np.stack([np.full(n, -0.5),
                  rng.uniform(0.1, 0.9, n),
                  rng.uniform(0.1, 0.9, n)], -1).astype(np.float32)
    d = np.stack([np.ones(n),
                  rng.uniform(-0.05, 0.05, n),
                  rng.uniform(-0.05, 0.05, n)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro, rd = jnp.asarray(o), jnp.asarray(d)
    depth = jnp.full((n,), 4.0)

    monkeypatch.setattr(vpt_mod, "_KHIT", True)
    cfg_k = dataclasses.replace(cfg, use_pallas=True)
    tr_k, acc_k = track_ray(scene, cfg_k, ro, rd, depth)

    cfg_l = dataclasses.replace(cfg, use_pallas=False)
    tr_l, acc_l = track_ray(scene, cfg_l, ro, rd, depth)

    # sanity: the khit path must handle these lanes itself (no overflow
    # fallback hiding the chain's acceptance decision)
    from adapt_tpu.ops.intersect import ray_track_hits
    K = 2 * cfg.n_null_objs
    *_n, ovf = ray_track_hits(scene, cfg_k, ro, rd, depth, K=K)
    assert not bool(np.asarray(ovf).any())

    np.testing.assert_allclose(np.asarray(tr_k), np.asarray(tr_l),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_l),
                               rtol=1e-4, atol=1e-5)
