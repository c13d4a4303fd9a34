"""End-to-end path-tracer validation against independent oracles.

The direct-lighting image must match a plain-numpy single-bounce renderer
pixel-for-pixel (both deterministic); the full GI render is checked for
energy conservation and non-degeneracy.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.pt import Renderer
from adapt_tpu.renderer.base import camera_rays

from conftest import SCENE_DIR
from reference_impl import direct_lighting_point


@pytest.fixture(scope="module")
def cbox_small():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=64, h=64, focal=cfg.focal * 64 / 512, end_x=64, end_y=64,
        anti_alias=False, stratified_sampling=False)
    return scene, cfg


def test_direct_lighting_matches_oracle(cbox_small):
    scene, cfg = cbox_small
    cfg = dataclasses.replace(cfg, max_bounce=1, use_rr=False)
    r = Renderer(scene, cfg)
    r.render()
    ours = np.asarray(r.pixels).reshape(-1, 3)

    p0 = np.asarray(scene.pre2)
    tris = np.stack([p0, p0 + np.asarray(scene.pre0),
                     p0 + np.asarray(scene.pre1)], axis=1)
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    ro, rd = np.asarray(ro), np.asarray(rd)
    oracle = np.stack([
        direct_lighting_point(ro[i], rd[i], tris, np.asarray(scene.tri_obj),
                              np.asarray(scene.mat_kd),
                              np.asarray(scene.prim_ng),
                              np.asarray(scene.emit_pos[0]),
                              np.asarray(scene.emit_intensity[0]))
        for i in range(ro.shape[0])])
    assert np.abs(ours - oracle).max() < 1e-3


def test_progressive_render_accumulates(cbox_small):
    scene, cfg = cbox_small
    cfg = dataclasses.replace(cfg, max_bounce=3)
    r = Renderer(scene, cfg)
    for _ in range(4):
        r.render()
    img = np.asarray(r.pixels)
    assert r.cnt == 4
    assert np.isfinite(img).all()
    assert img.max() > 0.01          # light got in
    assert img.mean() < 10.0         # no energy explosion
    # GI adds energy over direct-only
    r1 = Renderer(scene, dataclasses.replace(cfg, max_bounce=1, use_rr=False))
    for _ in range(4):
        r1.render()
    assert img.mean() > np.asarray(r1.pixels).mean()


def test_checkpoint_roundtrip(cbox_small):
    scene, cfg = cbox_small
    cfg = dataclasses.replace(cfg, max_bounce=2)
    r = Renderer(scene, cfg, seed=7)
    r.render()
    r.render()
    chk = r.get_check_point()

    r2 = Renderer(scene, cfg, seed=0)
    r2.load_check_point(chk)
    r.render()
    r2.render()
    assert np.allclose(np.asarray(r.pixels), np.asarray(r2.pixels))

    bad = dict(chk)
    bad["w"] = 32
    with pytest.raises(ValueError):
        r2.load_check_point(bad)


def test_checkpoint_consistency_breadth(cbox_small):
    """Reference path_tracer.py:195-211 validates film/crop/focal/counts on
    load; we additionally pin renderer type and max_bounce (VERDICT r1 #7):
    resuming a pt checkpoint into a bdpt run, or with a changed crop /
    focal / bounce budget, must raise."""
    from adapt_tpu.renderer.bdpt import BDPT
    scene, cfg = cbox_small
    cfg = dataclasses.replace(cfg, max_bounce=2)
    r = Renderer(scene, cfg, seed=7)
    r.render()
    chk = r.get_check_point()

    # renderer-type mismatch
    rb = BDPT(scene, cfg, seed=0)
    with pytest.raises(ValueError, match="renderer"):
        rb.load_check_point(chk)

    # per-field mismatches
    for field, val in (("focal", cfg.focal * 2), ("max_bounce", 5),
                       ("start_x", 1), ("end_y", cfg.h - 1)):
        r2 = Renderer(scene, dataclasses.replace(cfg, **{field: val}),
                      seed=0)
        with pytest.raises(ValueError, match=field):
            r2.load_check_point(chk)

    # matching config still loads
    r3 = Renderer(scene, cfg, seed=0)
    r3.load_check_point(chk)
    assert r3.cnt == 1


def test_pt_crop_traces_only_crop_pixels():
    """Crop windows restrict the traced wavefront (reference
    tracer_base.py:39-55); with a delta light and one bounce the direct
    component is deterministic per pixel, so cropped output must equal
    the full-frame render inside the window and be zero outside."""
    import dataclasses
    from adapt_tpu.renderer.base import crop_mask
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    base = dataclasses.replace(
        cfg, w=16, h=16, focal=cfg.focal * 16 / 512, start_x=0, end_x=16,
        start_y=0, end_y=16, max_bounce=1, anti_alias=False,
        stratified_sampling=False, use_rr=False)
    cropped = dataclasses.replace(base, start_x=4, end_x=12, start_y=3,
                                  end_y=13)
    key = jax.random.PRNGKey(2)
    from adapt_tpu.renderer.pt import render_pass_pt
    full = np.asarray(render_pass_pt(scene, base, key, jnp.int32(1)))
    crop = np.asarray(render_pass_pt(scene, cropped, key, jnp.int32(1)))
    mask = np.asarray(crop_mask(cropped))
    assert (crop[~mask] == 0.0).all()
    np.testing.assert_allclose(crop[mask], full[mask], rtol=1e-5,
                               atol=1e-7)
