"""Vectorized texture fetch from packed atlases (device side).

Mirrors reference bxdf/texture.py:102-139 `Texture.query` (bilinear taps into
the packed atlas with wrap-around) and path_tracer.py:276-289 `get_uv_item`
(local barycentric uv -> per-object global uv).
"""
from __future__ import annotations

import jax.numpy as jnp


def _bilinear(atlas, x, y):
    """Bilinear fetch at float coords (x, y) in atlas[y, x] convention."""
    H, W = atlas.shape[0], atlas.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    rx = (x - x0)[..., None]
    ry = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    q00 = atlas[y0i, x0i]
    q10 = atlas[y0i, x1i]
    q01 = atlas[y1i, x0i]
    q11 = atlas[y1i, x1i]
    top = q00 * (1.0 - rx) + q10 * rx
    bot = q01 * (1.0 - rx) + q11 * rx
    return top * (1.0 - ry) + bot * ry


def query_texture(table, obj_id, u, v):
    """Per-ray texture query; returns ((N,3) color, (N,) valid mask).

    Invalid where the object has no texture in this tag (mode == -255).
    Statically free when no object carries the tag (table.present False),
    and a single shared one-hot gather over all 9 columns otherwise."""
    if not table.present:
        N = obj_id.shape[0]
        return (jnp.full((N, 3), -1.0, jnp.float32),
                jnp.zeros((N,), bool))
    from .gather import tgather_pack
    idx = jnp.maximum(obj_id, 0)
    mode, w, h, sc_u, sc_v, off_x, off_y, c1, c2 = tgather_pack(
        [table.mode, table.w, table.h, table.scale_u, table.scale_v,
         table.off_x, table.off_y, table.c1, table.c2], idx)
    valid = (obj_id >= 0) & (mode > -255)

    w = jnp.maximum(w, 2.0)
    h = jnp.maximum(h, 2.0)
    su = u * sc_u * w
    sv = v * sc_v * h
    # wrap to [0, dim-1) like the reference's float mod (texture.py:120-121)
    su = jnp.mod(su, w - 1.0)
    sv = jnp.mod(sv, h - 1.0)
    x = su + off_x.astype(jnp.float32)
    y = sv + off_y.astype(jnp.float32)
    img_color = _bilinear(table.atlas, x, y)

    # checkerboard (mode 1): two colors on a unit grid
    checker = (jnp.floor(u * 2.0 * sc_u) + jnp.floor(v * 2.0 * sc_v)) % 2.0
    chk_color = jnp.where(checker[..., None] > 0.5, c2, c1)
    color = jnp.where((mode == 1)[..., None], chk_color, img_color)
    color = jnp.where(valid[..., None], color, -1.0)
    return color, valid


def process_ns(scene, cfg, it):
    """Perturb the shading normal with normal / bump maps
    (reference path_tracer.py:291-307).

    Normal map: replaces n_s with the mapped normal rotated into the
    geometric frame. Bump map: rotates n_s by the mapped offset. Statically
    pruned via cfg.has_normal_map / cfg.has_bump_map."""
    import dataclasses
    import jax.numpy as jnp
    from .math3d import delocalize_rotate, normalize
    n_s = it.n_s
    if cfg.has_normal_map:
        normal, valid = get_uv_item(scene, scene.tex["normal"], it)
        mapped = delocalize_rotate(it.n_g, normalize(normal))
        n_s = jnp.where(valid[..., None], mapped, n_s)
    if cfg.has_bump_map:
        delta, valid = get_uv_item(scene, scene.tex["bump"], it)
        bumped = normalize(delocalize_rotate(n_s, normalize(delta)))
        n_s = jnp.where(valid[..., None], bumped, n_s)
    if n_s is it.n_s:
        return it
    return dataclasses.replace(it, n_s=n_s)


def get_uv_item(scene, table, it):
    """Local barycentric uv -> global uv -> texture color
    (reference path_tracer.py:276-289)."""
    if not table.present:
        N = it.prim_id.shape[0]
        return (jnp.full((N, 3), -1.0, jnp.float32),
                jnp.zeros((N,), bool))
    from .gather import tgather
    prim = it.prim_id
    obj = jnp.maximum(it.obj_id, 0)
    is_sphere = tgather(scene.obj_is_sphere, obj) > 0
    uvc = tgather(scene.prim_uv, prim)  # (N,3,2)
    lu, lv = it.uv[..., 0], it.uv[..., 1]
    w0 = (1.0 - lu - lv)[..., None]
    tri_uv = uvc[:, 1] * lu[..., None] + uvc[:, 2] * lv[..., None] \
        + uvc[:, 0] * w0
    u = jnp.where(is_sphere, lu, tri_uv[..., 0])
    v = jnp.where(is_sphere, lv, tri_uv[..., 1])
    return query_texture(table, it.obj_id, u, v)
