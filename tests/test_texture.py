"""Texture pipeline: packing, atlas query, uv interpolation, e2e render."""
import os
import shutil
import xml.etree.ElementTree as xet

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.texture import (TextureRec, image_packer, MODE_IMAGE,
                                     MODE_CHECKER)
from adapt_tpu.ops.texture_ops import query_texture
from adapt_tpu.scene.compile import TextureTable

from conftest import SCENE_DIR


def _img_elem(tmp_path, name, arr):
    from PIL import Image
    p = str(tmp_path / f"{name}.png")
    Image.fromarray((arr * 255).astype(np.uint8)).save(p)
    e = xet.Element("texture", {"id": name, "type": "image",
                                "tag": "albedo"})
    xet.SubElement(e, "string", {"name": "filename", "value": p})
    return e


def test_packing_and_query(tmp_path):
    # two constant-color images of different sizes
    red = np.zeros((16, 32, 3), np.float32)
    red[..., 0] = 1.0
    blue = np.zeros((48, 24, 3), np.float32)
    blue[..., 2] = 1.0
    recs = [TextureRec(_img_elem(tmp_path, "red", red)),
            TextureRec(_img_elem(tmp_path, "blue", blue))]
    atlas, by_id = image_packer(recs)
    assert atlas is not None
    # offsets written back and images present at those offsets
    for rec, img in ((by_id["red"], red), (by_id["blue"], blue)):
        patch = atlas[rec.off_y:rec.off_y + rec.h,
                      rec.off_x:rec.off_x + rec.w]
        assert np.allclose(patch, img)

    # device-side query on object 0 (red) and 1 (blue)
    def row(attr, default=0):
        return jnp.asarray([getattr(by_id["red"], attr, default),
                            getattr(by_id["blue"], attr, default)])
    table = TextureTable(
        mode=jnp.asarray([MODE_IMAGE, MODE_IMAGE]),
        off_x=row("off_x"), off_y=row("off_y"),
        w=jnp.asarray([float(by_id["red"].w), float(by_id["blue"].w)]),
        h=jnp.asarray([float(by_id["red"].h), float(by_id["blue"].h)]),
        scale_u=jnp.ones(2), scale_v=jnp.ones(2),
        c1=jnp.zeros((2, 3)), c2=jnp.ones((2, 3)),
        atlas=jnp.asarray(atlas), present=True)
    obj = jnp.asarray([0, 1, 0])
    u = jnp.asarray([0.5, 0.5, 0.25])
    v = jnp.asarray([0.5, 0.5, 0.75])
    color, valid = query_texture(table, obj, u, v)
    color = np.asarray(color)
    assert np.asarray(valid).all()
    assert np.allclose(color[0], [1, 0, 0], atol=1e-3)
    assert np.allclose(color[1], [0, 0, 1], atol=1e-3)
    assert np.allclose(color[2], [1, 0, 0], atol=1e-3)


def test_checkerboard_query():
    e = xet.Element("texture", {"id": "chk", "type": "checkerboard",
                                "tag": "albedo"})
    xet.SubElement(e, "rgb", {"name": "c1", "value": "1, 0, 0"})
    xet.SubElement(e, "rgb", {"name": "c2", "value": "0, 1, 0"})
    rec = TextureRec(e)
    assert rec.mode == MODE_CHECKER
    table = TextureTable(
        mode=jnp.asarray([MODE_CHECKER]), off_x=jnp.zeros(1, jnp.int32),
        off_y=jnp.zeros(1, jnp.int32), w=jnp.zeros(1), h=jnp.zeros(1),
        scale_u=jnp.ones(1), scale_v=jnp.ones(1),
        c1=jnp.asarray(rec.c1)[None], c2=jnp.asarray(rec.c2)[None],
        atlas=jnp.zeros((1, 1, 3)), present=True)
    obj = jnp.zeros(4, jnp.int32)
    u = jnp.asarray([0.1, 0.6, 0.1, 0.6])
    v = jnp.asarray([0.1, 0.1, 0.6, 0.6])
    color, _ = query_texture(table, obj, u, v)
    c = np.asarray(color)
    # alternating cells on the unit grid
    assert np.allclose(c[0], c[3]) and np.allclose(c[1], c[2])
    assert not np.allclose(c[0], c[1])


def test_textured_scene_render(tmp_path):
    """cbox with a 2-tone image texture on the floor: the rendered floor
    must show both tones."""
    import dataclasses
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.pt import render_pass_pt

    tex = np.zeros((64, 64, 3), np.float32)
    tex[:, :32] = [1.0, 0.1, 0.1]
    tex[:, 32:] = [0.1, 0.1, 1.0]
    from PIL import Image
    tex_path = str(tmp_path / "twotone.png")
    Image.fromarray((tex * 255).astype(np.uint8)).save(tex_path)

    tree = xet.parse(os.path.join(SCENE_DIR, "cbox", "cbox.xml"))
    root = tree.getroot()
    te = xet.SubElement(root, "texture", {"id": "twotone", "type": "image",
                                          "tag": "albedo"})
    xet.SubElement(te, "string", {"name": "filename", "value": tex_path})
    # attach to the floor (first shape)
    floor = root.findall("shape")[0]
    xet.SubElement(floor, "ref", {"type": "texture", "id": "twotone"})
    tree.write(str(tmp_path / "scene.xml"))
    shutil.copytree(os.path.join(SCENE_DIR, "meshes"),
                    str(tmp_path.parent / "meshes"), dirs_exist_ok=True)

    scene, cfg, _ = load_scene(str(tmp_path), "scene.xml")
    cfg = dataclasses.replace(cfg, w=48, h=48, focal=cfg.focal * 48 / 512,
                              end_x=48, end_y=48, max_bounce=1,
                              use_rr=False, anti_alias=False,
                              stratified_sampling=False,
                              world_scattering=False, medium_kinds=())
    img = np.asarray(render_pass_pt(scene, cfg, jax.random.PRNGKey(0),
                                    jnp.int32(1))).reshape(48, 48, 3)
    # floor occupies low-j rows; find lit floor pixels and check both tones
    floor_px = img[:, :12].reshape(-1, 3)
    lit = floor_px[floor_px.max(-1) > 0.01]
    assert len(lit) > 50
    reddish = (lit[:, 0] > 2 * lit[:, 2]).mean()
    bluish = (lit[:, 2] > 2 * lit[:, 0]).mean()
    assert reddish > 0.1 and bluish > 0.1, (reddish, bluish)
