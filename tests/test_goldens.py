"""Golden-image regression: fixed-RNG single-pass renders must stay stable.

Catches unintended estimator changes (any intentional change should
regenerate the goldens and say so in the commit). Tolerance allows for
compiler-version reassociation noise but not semantic drift.
"""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.pt import render_pass_pt
from adapt_tpu.renderer.vpt import render_pass_vpt
from adapt_tpu.renderer.bdpt import render_pass_bdpt

from conftest import SCENE_DIR

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _small(cfg, w=48, mb=3):
    return dataclasses.replace(
        cfg, w=w, h=w, focal=cfg.focal * w / 512, end_x=w, end_y=w,
        max_bounce=mb, anti_alias=False, stratified_sampling=False,
        use_rr=False)


def _check(img, name):
    golden = np.load(os.path.join(GOLDEN_DIR, name))
    img = np.asarray(img)
    assert img.shape == golden.shape
    # mean must track closely; per-pixel tolerance absorbs fp reassociation
    assert abs(img.mean() - golden.mean()) < 1e-3 * max(golden.mean(), 1e-3)
    assert np.abs(img - golden).max() < 5e-2, np.abs(img - golden).max()


def test_golden_pt():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    img = render_pass_pt(scene, _small(cfg), jax.random.PRNGKey(42),
                         jnp.int32(1))
    _check(img, "cbox_pt_48.npy")


def test_golden_bdpt():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    img, _, _ = render_pass_bdpt(scene, _small(cfg), jax.random.PRNGKey(42),
                                 jnp.int32(1))
    _check(img, "cbox_bdpt_48.npy")


def test_golden_vpt():
    scene, cfg, _ = load_scene(SCENE_DIR + "/vpt/", "cbox.xml")
    img = render_pass_vpt(scene, _small(cfg), jax.random.PRNGKey(42),
                          jnp.int32(1))
    _check(img, "vptcbox_48.npy")


def test_golden_ssao():
    from adapt_tpu.renderer.ssao import depth_prepass, render_pass_ssao
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = _small(cfg)
    key = jax.random.PRNGKey(42)
    depth = depth_prepass(scene, cfg, key)
    img = render_pass_ssao(scene, cfg, key, jnp.int32(1), depth)
    _check(img, "cbox_ao_48.npy")


def test_golden_direct():
    from adapt_tpu.renderer.direct import render_pass_direct
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    img, _d, _n = render_pass_direct(scene, _small(cfg),
                                     jax.random.PRNGKey(42), jnp.int32(1))
    _check(img, "cbox_direct_48.npy")
