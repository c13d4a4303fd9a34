"""Volumetric path tracer validation.

1. With all media disabled, VPT must reduce exactly to the PT estimator
   (direct lighting matches the independent numpy oracle).
2. track_ray transmittance through a null-surface-bounded homogeneous
   medium must equal the analytic Beer-Lambert factor of the chord.
3. Smoke render of the shipped vpt scene: finite, energy-sane.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.pt import render_pass_pt
from adapt_tpu.renderer.vpt import render_pass_vpt, track_ray
from adapt_tpu.ops.intersect import ray_intersect

from conftest import SCENE_DIR


@pytest.fixture(scope="module")
def vpt_scene():
    scene, cfg, _ = load_scene(SCENE_DIR + "/vpt/", "cbox.xml")
    return scene, cfg


def test_vpt_reduces_to_pt_without_media():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=32, h=32, focal=cfg.focal * 32 / 512, end_x=32, end_y=32,
        max_bounce=1, use_rr=False, anti_alias=False,
        stratified_sampling=False, world_scattering=False,
        medium_kinds=(), has_null_bsdf=False)
    key = jax.random.PRNGKey(0)
    pt = np.asarray(render_pass_pt(scene, cfg, key, jnp.int32(1)))
    vpt = np.asarray(render_pass_vpt(scene, cfg, key, jnp.int32(1)))
    # direct lighting from a delta light is deterministic: exact match
    assert np.abs(pt - vpt).max() < 1e-4


def test_track_ray_beer_lambert(vpt_scene):
    scene, cfg = vpt_scene
    # the scattering medium is bounded by the null-surface box; find it
    null_obj = int(np.argmax(np.asarray(scene.mat_is_bsdf)
                             & (np.asarray(scene.mat_type) < 0)))
    u_e = np.asarray(scene.medium.u_e[null_obj])
    lo = np.asarray(scene.obj_aabb_min[null_obj])
    hi = np.asarray(scene.obj_aabb_max[null_obj])
    center = (lo + hi) / 2
    # ray through the box center along +x, starting just outside the box
    start = np.array([lo[0] - 0.05, center[1], center[2]], np.float32)
    d = np.array([1.0, 0.0, 0.0], np.float32)
    total = float(hi[0] - lo[0] + 0.1)
    tr, _ = track_ray(scene, cfg, jnp.asarray(start[None]),
                      jnp.asarray(d[None]), jnp.full((1,), total))
    # chord length inside the box
    it = ray_intersect(scene, cfg, jnp.asarray(start[None]),
                       jnp.asarray(d[None]))
    t_in = float(it.t[0])
    it2 = ray_intersect(scene, cfg,
                        jnp.asarray((start + d * (t_in + 1e-3))[None]),
                        jnp.asarray(d[None]))
    chord = float(it2.t[0]) + 1e-3
    expect = np.exp(-u_e * chord)
    assert np.allclose(np.asarray(tr)[0], expect, rtol=2e-2), \
        (np.asarray(tr)[0], expect)


def test_vpt_smoke_render(vpt_scene):
    scene, cfg = vpt_scene
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=4)
    key = jax.random.PRNGKey(1)
    img = np.asarray(render_pass_vpt(scene, cfg, key, jnp.int32(1)))
    assert np.isfinite(img).all()
    assert img.max() > 0.01
    assert img.mean() < 10.0
