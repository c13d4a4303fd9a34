"""SSAO and direct Blinn-Phong preview renderer validation.

Direct preview is checked pixel-for-pixel against an independent numpy
Blinn-Phong oracle (reference direct_render.py:26-134 semantics). SSAO
(reference ssao.py:27-130) is checked structurally: the depth prepass must
reproduce deterministic primary-hit depths, AO is a valid occlusion ratio in
[0,1], and concave image-corner junctions of the cornell box must come out
darker than the open back-wall center.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.direct import DirectRenderer
from adapt_tpu.renderer.ssao import SSAORenderer, depth_prepass
from adapt_tpu.renderer.base import camera_rays
from adapt_tpu.ops.intersect import ray_intersect

from conftest import SCENE_DIR
from reference_impl import blinn_phong_direct


@pytest.fixture(scope="module")
def cbox_small():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=64, h=64, focal=cfg.focal * 64 / 512, end_x=64, end_y=64,
        anti_alias=False, stratified_sampling=False)
    return scene, cfg


def test_direct_matches_blinn_phong_oracle(cbox_small):
    scene, cfg = cbox_small
    r = DirectRenderer(scene, cfg)
    r.render()
    ours = np.asarray(r.pixels).reshape(-1, 3)

    p0 = np.asarray(scene.pre2)
    tris = np.stack([p0, p0 + np.asarray(scene.pre0),
                     p0 + np.asarray(scene.pre1)], axis=1)
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    ro, rd = np.asarray(ro), np.asarray(rd)
    oracle = np.stack([
        blinn_phong_direct(ro[i], rd[i], tris, np.asarray(scene.tri_obj),
                           np.asarray(scene.mat_kd),
                           np.asarray(scene.mat_ks),
                           np.asarray(scene.mat_kg),
                           np.asarray(scene.prim_ng),
                           np.asarray(scene.emit_pos[0]),
                           np.asarray(scene.emit_intensity[0]))
        for i in range(ro.shape[0])])
    assert np.abs(ours - oracle).max() < 1e-3


def test_direct_side_outputs(cbox_small):
    scene, cfg = cbox_small
    r = DirectRenderer(scene, cfg)
    r.render()
    depth = np.asarray(r.depth)
    normal = np.asarray(r.normal)
    # interior rays all hit (border rays graze out the open front face)
    assert (depth[2:-2, 2:-2] > 0).all() and np.isfinite(depth).all()
    # normals are packed n*0.5+0.5
    assert normal.min() >= 0.0 and normal.max() <= 1.0
    assert normal.std() > 0.05           # multiple wall orientations visible


def test_ssao_depth_prepass_matches_primary_depth(cbox_small):
    scene, cfg = cbox_small
    dm = np.asarray(depth_prepass(scene, cfg, jax.random.PRNGKey(3)))
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    it = ray_intersect(scene, cfg, ro, rd)
    want = np.where(np.asarray(it.is_hit), np.asarray(it.t), 0.0)
    # anti_alias off -> every prepass sample traces the same rays
    assert np.abs(dm - want).max() < 1e-4


def test_ssao_corner_occlusion(cbox_small):
    scene, cfg = cbox_small
    r = SSAORenderer(scene, cfg)
    for _ in range(4):
        r.render()
    ao = np.asarray(r.pixels)[..., 0]          # gray: all channels equal
    img = np.asarray(r.pixels)
    assert np.allclose(img[..., 0], img[..., 1])
    assert ao.min() >= 0.0 and ao.max() <= 1.0 + 1e-6
    # concave two/three-wall junctions at the image corners must be more
    # occluded than the open back-wall center
    c = ao.shape[0] // 2
    center = ao[c - 4:c + 4, c - 4:c + 4].mean()
    corners = np.mean([ao[:8, :8].mean(), ao[:8, -8:].mean(),
                       ao[-8:, :8].mean(), ao[-8:, -8:].mean()])
    assert center > corners + 0.05, (center, corners)
