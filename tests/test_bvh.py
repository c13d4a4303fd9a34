"""BVH traversal must agree exactly with the brute-force wavefront scan."""
import os
import shutil
import xml.etree.ElementTree as xet
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.ops.intersect import ray_intersect, does_intersect

from conftest import SCENE_DIR


@pytest.fixture(scope="module")
def bunny_scene(tmp_path_factory):
    """cbox walls + the 495-face bunny -> ~530 prims (BVH enabled)."""
    tmp = tmp_path_factory.mktemp("bvhscene")
    tree = xet.parse(os.path.join(SCENE_DIR, "cbox", "cbox.xml"))
    root = tree.getroot()
    shape = xet.SubElement(root, "shape", {"type": "obj"})
    xet.SubElement(shape, "string",
                   {"name": "filename",
                    "value": "../meshes/cornell/bunny.obj"})
    ref = xet.SubElement(shape, "ref", {"type": "material", "id": "white"})
    tree.write(str(tmp / "scene.xml"))
    shutil.copytree(os.path.join(SCENE_DIR, "meshes"),
                    str(tmp.parent / "meshes"), dirs_exist_ok=True)
    scene, cfg, _ = load_scene(str(tmp), "scene.xml")
    assert cfg.use_bvh, "expected BVH to be enabled for this prim count"
    return scene, cfg


def _rays(scene, n, seed):
    rng = np.random.RandomState(seed)
    lo = np.asarray(scene.obj_aabb_min).min(0)
    hi = np.asarray(scene.obj_aabb_max).max(0)
    o = rng.uniform(lo - 1, hi + 1, (n, 3)).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_closest_hit_matches_brute_force(bunny_scene):
    scene, cfg = bunny_scene
    cfg_bf = dataclasses.replace(cfg, use_bvh=False)
    o, d = _rays(scene, 2048, 0)
    it_b = ray_intersect(scene, cfg, o, d)
    it_f = ray_intersect(scene, cfg_bf, o, d)
    assert bool(jnp.all(it_b.is_hit == it_f.is_hit))
    hit = np.asarray(it_f.is_hit)
    tb = np.asarray(it_b.t)[hit]
    tf = np.asarray(it_f.t)[hit]
    # distances must agree (prim ids may differ on coplanar ties)
    assert np.allclose(tb, tf, rtol=1e-5, atol=1e-5)
    same = np.asarray(it_b.prim_id)[hit] == np.asarray(it_f.prim_id)[hit]
    assert same.mean() > 0.98


def test_bvh_occlusion_matches_brute_force(bunny_scene):
    scene, cfg = bunny_scene
    cfg_bf = dataclasses.replace(cfg, use_bvh=False)
    o, d = _rays(scene, 2048, 1)
    max_t = jnp.full((2048,), 3.0)
    occ_b = does_intersect(scene, cfg, o, d, max_t)
    occ_f = does_intersect(scene, cfg_bf, o, d, max_t)
    assert bool(jnp.all(occ_b == occ_f))


def test_bvh_render_matches_brute_force(bunny_scene):
    from adapt_tpu.renderer.pt import render_pass_pt
    scene, cfg = bunny_scene
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=2,
                              use_rr=False, anti_alias=False,
                              stratified_sampling=False,
                              world_scattering=False, medium_kinds=())
    cfg_bf = dataclasses.replace(cfg, use_bvh=False)
    key = jax.random.PRNGKey(0)
    a = np.asarray(render_pass_pt(scene, cfg, key, jnp.int32(1)))
    b = np.asarray(render_pass_pt(scene, cfg_bf, key, jnp.int32(1)))
    assert np.abs(a - b).max() < 1e-3


def test_native_leaf_cap_on_clumpy_scenes():
    """Leaves are HARD-capped at the traversal's LEAF_MAX: the old builder
    allowed up to 2*kLeafMax prims when SAH preferred a fat leaf, and the
    flat walk silently skipped slots 4..7 (review-confirmed on clumpy
    geometry)."""
    from adapt_tpu.native import bvh_build
    from adapt_tpu.ops.bvh import LEAF_MAX
    rng = np.random.RandomState(11)
    # clumps of 5-8 near-coincident prims: exactly the SAH-prefers-a-leaf
    # shape that used to emit oversize leaves
    clumps = rng.uniform(-10, 10, (600, 3))
    pts = np.repeat(clumps, rng.randint(5, 9, 600).clip(5, 8)[:600],
                    axis=0)[:4096]
    pts = pts + rng.uniform(-1e-3, 1e-3, pts.shape)
    lo = pts - 1e-3
    hi = pts + 1e-3
    node_f, node_i, order = bvh_build(
        np.concatenate([lo, hi], 1).astype(np.float32))
    cnt = node_i[:, 1]
    assert cnt.max() <= LEAF_MAX, int(cnt.max())
    assert cnt[cnt > 0].sum() == pts.shape[0]      # every prim in a leaf
    assert np.sort(order).tolist() == list(range(pts.shape[0]))
