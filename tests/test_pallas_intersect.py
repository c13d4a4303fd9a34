"""Pallas triangle-intersect kernel == jnp brute-force scan, exactly.

Runs the kernel in interpret mode (tests are on the CPU backend; Mosaic
compilation is TPU-only) over cbox primary rays and random ray batches,
including max_t-clipped shadow rays. The kernel uses the same op order as
the jnp path so hits must agree bitwise.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.ops import intersect_pallas
from adapt_tpu.ops.intersect import ray_intersect, does_intersect
from adapt_tpu.renderer.base import camera_rays

from conftest import SCENE_DIR


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    old = intersect_pallas._INTERPRET
    intersect_pallas._INTERPRET = True
    yield
    intersect_pallas._INTERPRET = old


@pytest.fixture(scope="module")
def cbox():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=32, h=32, focal=cfg.focal * 32 / 512, end_x=32, end_y=32,
        anti_alias=False, stratified_sampling=False)
    return scene, cfg


def _rays(scene, cfg, key):
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    # add random interior rays: origins jittered off the camera ray hits
    k1, k2 = jax.random.split(key)
    t = jax.random.uniform(k1, (ro.shape[0], 1), minval=0.1, maxval=2.0)
    o2 = ro + rd * t
    d2 = jax.random.normal(k2, rd.shape)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    return (jnp.concatenate([ro, o2], 0), jnp.concatenate([rd, d2], 0))


def test_closest_hit_matches_scan(cbox):
    scene, cfg = cbox
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(5))
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_pallas=False),
                        ro, rd)
    got = ray_intersect(scene, dataclasses.replace(cfg, use_pallas=True),
                        ro, rd)
    # hit decisions must agree exactly; float fields may differ by FMA
    # rounding (differently-fused XLA programs), so allow ~1 ULP
    assert (np.asarray(got.obj_id) == np.asarray(ref.obj_id)).all()
    assert (np.asarray(got.prim_id) == np.asarray(ref.prim_id)).all()
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(got.uv), np.asarray(ref.uv),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(got.n_g), np.asarray(ref.n_g))


def test_any_hit_matches_scan(cbox):
    scene, cfg = cbox
    ro, rd = _rays(scene, cfg, jax.random.PRNGKey(11))
    # unclipped and max_t-clipped (shadow-ray form)
    for max_t in (None, jnp.full((ro.shape[0],), 1.5, jnp.float32)):
        ref = does_intersect(scene,
                             dataclasses.replace(cfg, use_pallas=False),
                             ro, rd, max_t)
        got = does_intersect(scene,
                             dataclasses.replace(cfg, use_pallas=True),
                             ro, rd, max_t)
        assert (np.asarray(got) == np.asarray(ref)).all()


def test_nonmultiple_batch_and_sphere_combine():
    """Ray counts not divisible by LANE_B, and a scene with spheres."""
    scene, cfg, _ = load_scene(SCENE_DIR + "/csphere/", "single-ball.xml")
    cfg = dataclasses.replace(
        cfg, w=17, h=13, focal=cfg.focal * 17 / 512, end_x=17, end_y=13,
        anti_alias=False, stratified_sampling=False)
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    ref = ray_intersect(scene, dataclasses.replace(cfg, use_pallas=False),
                        ro, rd)
    got = ray_intersect(scene, dataclasses.replace(cfg, use_pallas=True),
                        ro, rd)
    assert (np.asarray(got.obj_id) == np.asarray(ref.obj_id)).all()
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=2e-6)
