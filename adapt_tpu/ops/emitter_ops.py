"""Vectorized emitter sampling (device side).

Batched equivalents of the reference's TaichiSource methods
(emitters/abtract_source.py:77-244): next-event sample_hit, emission
sampling sample_le (for BDPT light subpaths), eval_le, and the pdf helpers.
Per-ray emitter parameters are gathered from the SceneData emitter table by
index; only the emitter kinds present in the scene are evaluated (static
pruning via cfg.emitter_kinds).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import (EmitterTag, INV_PI, INV_2PI, BIT_POS_DELTA)
from .math3d import dot, normalize, delocalize_rotate, norm, world_frame, \
    AXIS_Y
from .gather import tgather, tgather_pack
from .sampling import (uniform_sphere, cosine_hemisphere, uniform_cone,
                       sample_triangle, concentric_disk)

HEMISPHERE_SAMPLE_SPHERE = True  # reference abtract_source.py:25


def _rotate(anchor, local_dir):
    return delocalize_rotate(anchor, local_dir)


def sample_light_index(cfg, u, no_sample):
    """Uniform light pick with exclusion (reference path_tracer.py:537-554).

    Returns (idx, pdf, valid)."""
    E = cfg.n_emitters
    if E == 0:
        # emitter-less scene (skybox/ambient only): nothing to sample —
        # valid=False everywhere instead of a ZeroDivisionError at trace
        z = jnp.zeros(u.shape, jnp.int32)
        return z, jnp.ones_like(u), jnp.zeros(u.shape, bool)
    base_idx = jnp.minimum((u * E).astype(jnp.int32), E - 1)
    pdf = jnp.full_like(u, 1.0 / E)
    valid = jnp.ones(u.shape, bool)
    if E <= 1:
        valid = jnp.where(no_sample >= 0, False, valid)
        return base_idx, pdf, valid
    ex_idx = jnp.minimum((u * (E - 1)).astype(jnp.int32), E - 2)
    ex_idx = ex_idx + (ex_idx >= no_sample)
    excl = no_sample >= 0
    idx = jnp.where(excl, ex_idx, base_idx)
    pdf = jnp.where(excl, 1.0 / (E - 1), pdf)
    return idx, pdf, valid


def _area_sample_hit(scene, eid, hit_pos, u, e_int, e_inv_area):
    """Area-light branch of sample_hit (abtract_source.py:98-132).
    e_int/e_inv_area: pre-gathered by the caller's shared one-hot."""
    obj = jnp.maximum(tgather(scene.emit_obj, eid), 0)
    is_sphere = tgather(scene.obj_is_sphere, obj) > 0
    start = tgather(scene.obj_start, obj)
    cnt = jnp.maximum(tgather(scene.obj_cnt, obj), 1)

    # triangle branch: uniform pick (assumes similar triangle areas, same
    # approximation as the reference)
    tri_local = jnp.minimum((u[:, 0] * cnt).astype(jnp.int32), cnt - 1)
    tri_id = start + tri_local
    dv1 = tgather(scene.pre0, tri_id)
    dv2 = tgather(scene.pre1, tri_id)
    p_base = tgather(scene.pre2, tri_id)
    tri_pos = sample_triangle(dv1, dv2, u[:, 1], u[:, 2]) + p_base
    tri_normal = tgather(scene.prim_ng, tri_id)

    # sphere branch: hemisphere toward the shading point
    center = tgather(scene.pre0, start)            # sphere center in pre0
    radius = tgather(scene.pre1, start)[:, 0]
    to_hit = normalize(hit_pos - center)
    local_dir, sph_pdf = uniform_sphere(u[:, 1], u[:, 2])
    sph_normal = _rotate(to_hit, local_dir)
    sph_pos = center + sph_normal * radius[..., None]

    if HEMISPHERE_SAMPLE_SPHERE:
        sph_pdf_area = sph_pdf / jnp.maximum(radius * radius, 1e-12)
    else:
        # reference flag-False branch keeps the uniform-area pdf
        # (abtract_source.py:114-116), NOT 1.0
        sph_pdf_area = e_inv_area

    ret_pos = jnp.where(is_sphere[..., None], sph_pos, tri_pos)
    normal = jnp.where(is_sphere[..., None], sph_normal, tri_normal)
    ret_pdf = jnp.where(is_sphere, sph_pdf_area, e_inv_area)

    diff = hit_pos - ret_pos
    dot_light = dot(normalize(diff), normal)
    facing = dot_light > 0.0
    diff_norm2 = jnp.sum(diff * diff, axis=-1)
    ret_pdf = jnp.where(facing,
                        ret_pdf * diff_norm2 / jnp.maximum(dot_light, 1e-12),
                        1.0)
    ret_int = jnp.where((facing & (ret_pdf > 0.0))[..., None],
                        e_int / jnp.maximum(ret_pdf, 1e-12)[..., None],
                        0.0)
    return ret_pos, ret_int, ret_pdf, normal


def sample_hit(scene, cfg, eid, hit_pos, u):
    """NEE light sample toward `hit_pos`; returns (pos, intensity, pdf, normal).

    `intensity` is already divided by the (solid-angle) pdf for area lights,
    matching the reference contract (abtract_source.py:82-158). u: (N,3)."""
    N = hit_pos.shape[0]
    # ONE shared one-hot for all per-emitter tables (CLAUDE.md rule 1;
    # this runs once per shadow ray per bounce)
    kind, e_pos, e_int, e_dir, e_r, e_inv_area = tgather_pack(
        [scene.emit_kind, scene.emit_pos, scene.emit_intensity,
         scene.emit_dir, scene.emit_r, scene.emit_inv_area], eid)
    ret_pos = e_pos
    ret_int = e_int
    ret_pdf = jnp.ones((N,), jnp.float32)
    normal = jnp.zeros((N, 3), jnp.float32)

    for k in cfg.emitter_kinds:
        m = kind == k
        if k == EmitterTag.POINT:
            to_hit = hit_pos - e_pos
            atten = jnp.minimum(
                1.0 / jnp.maximum(jnp.sum(to_hit * to_hit, -1), 1e-5), 1.0)
            ret_int = jnp.where(m[..., None], e_int * atten[..., None],
                                ret_int)
        elif k == EmitterTag.AREA:
            a_pos, a_int, a_pdf, a_n = _area_sample_hit(
                scene, eid, hit_pos, u, e_int, e_inv_area)
            ret_pos = jnp.where(m[..., None], a_pos, ret_pos)
            ret_int = jnp.where(m[..., None], a_int, ret_int)
            ret_pdf = jnp.where(m, a_pdf, ret_pdf)
            normal = jnp.where(m[..., None], a_n, normal)
        elif k == EmitterTag.SPOT:
            to_hit = hit_pos - e_pos
            depth = jnp.maximum(norm(to_hit), 1e-5)
            cos_val = dot(to_hit / depth[..., None], e_dir)
            in_cone = cos_val > e_r
            s_int = jnp.where(in_cone[..., None],
                              e_int / (depth * depth)[..., None], 0.0)
            ret_int = jnp.where(m[..., None], s_int, ret_int)
        elif k == EmitterTag.COLLIMATED:
            # deterministic back-projection onto the beam (abtract:142-157)
            r = e_r
            d = e_dir
            to_hit = hit_pos - e_pos
            proj = dot(to_hit, d)
            dist2 = jnp.maximum(jnp.sum(to_hit * to_hit, -1) - proj * proj,
                                0.0)
            behind = proj <= 0.0
            ok = (r > 0.0) & ~behind & (jnp.sqrt(dist2) < r)
            # reference quirk kept: points BEHIND the beam origin keep
            # full intensity toward ret_pos = emitter pos (the r>0 branch
            # only zeroes on dist >= r, abtract_source.py:148-155 —
            # invisible in shipped scenes because the laser sits on a
            # wall, PARITY.md behavior notes)
            lit = (r > 0.0) & (behind | (jnp.sqrt(dist2) < r))
            c_pos = hit_pos - proj[..., None] * d
            ret_pos = jnp.where((m & ok)[..., None], c_pos, ret_pos)
            ret_int = jnp.where(m[..., None],
                                jnp.where(lit[..., None], e_int, 0.0),
                                ret_int)
            ret_pdf = jnp.where(m, 0.0, ret_pdf)
            normal = jnp.where((m & ok)[..., None], d, normal)
    return ret_pos, ret_int, ret_pdf, normal


def sample_le(scene, cfg, eid, u):
    """Emission sampling for light subpaths (abtract_source.py:160-208).

    u: (N,5) — the area branch consumes (tri pick, 2 position, 2
    direction) uniforms; the reference draws each fresh, and sharing one
    between position and direction correlates them, biasing every
    s>=2 / t=1 BDPT strategy (the estimator divides by pdf_pos*pdf_dir,
    which is then not the sampled joint density).
    Returns (ray_o, ray_d, pdf_pos, pdf_dir, normal)."""
    N = eid.shape[0]
    ray_o = tgather(scene.emit_pos, eid)
    ray_d = jnp.tile(jnp.array([0.0, 1.0, 0.0], jnp.float32), (N, 1))
    normal = ray_d
    pdf_dir = jnp.zeros((N,), jnp.float32)
    pdf_pos = jnp.ones((N,), jnp.float32)
    kind = tgather(scene.emit_kind, eid)

    for k in cfg.emitter_kinds:
        m = kind == k
        if k == EmitterTag.POINT:
            d, pdf = uniform_sphere(u[:, 0], u[:, 1])
            ray_d = jnp.where(m[..., None], d, ray_d)
            normal = jnp.where(m[..., None], d, normal)
            pdf_dir = jnp.where(m, pdf, pdf_dir)
        elif k == EmitterTag.AREA:
            obj = jnp.maximum(tgather(scene.emit_obj, eid), 0)
            is_sphere = tgather(scene.obj_is_sphere, obj) > 0
            start = tgather(scene.obj_start, obj)
            cnt = jnp.maximum(tgather(scene.obj_cnt, obj), 1)
            tri_local = jnp.minimum((u[:, 0] * cnt).astype(jnp.int32),
                                    cnt - 1)
            tri_id = start + tri_local
            tri_n = tgather(scene.prim_ng, tri_id)
            tri_o = sample_triangle(tgather(scene.pre0, tri_id), tgather(scene.pre1, tri_id),
                                    u[:, 1], u[:, 2]) + tgather(scene.pre2, tri_id)
            sph_n, _ = uniform_sphere(u[:, 1], u[:, 2])
            center = tgather(scene.pre0, start)
            radius = tgather(scene.pre1, start)[:, 0]
            sph_o = center + sph_n * radius[..., None]
            a_n = jnp.where(is_sphere[..., None], sph_n, tri_n)
            a_o = jnp.where(is_sphere[..., None], sph_o, tri_o)
            local_d, c_pdf = cosine_hemisphere(u[:, 3], u[:, 4])
            a_d = _rotate(a_n, local_d)
            ray_o = jnp.where(m[..., None], a_o, ray_o)
            ray_d = jnp.where(m[..., None], a_d, ray_d)
            normal = jnp.where(m[..., None], a_n, normal)
            pdf_dir = jnp.where(m, c_pdf, pdf_dir)
            pdf_pos = jnp.where(m, tgather(scene.emit_inv_area, eid), pdf_pos)
        elif k == EmitterTag.SPOT:
            local_d = uniform_cone(u[:, 0], u[:, 1], tgather(scene.emit_r, eid))
            d = _rotate(tgather(scene.emit_dir, eid), local_d)
            ray_d = jnp.where(m[..., None], d, ray_d)
            normal = jnp.where(m[..., None], tgather(scene.emit_dir, eid), normal)
            pdf_dir = jnp.where(m, INV_2PI / (1.0 - tgather(scene.emit_r, eid)),
                                pdf_dir)
        elif k == EmitterTag.COLLIMATED:
            d = tgather(scene.emit_dir, eid)
            off = concentric_disk(u[:, 0], u[:, 1]) \
                * tgather(scene.emit_r, eid)[..., None]
            o = tgather(scene.emit_pos, eid) + jnp.where(
                (tgather(scene.emit_r, eid) > 0.0)[..., None],
                world_frame(jnp.broadcast_to(AXIS_Y, d.shape), d, off), 0.0)
            ray_o = jnp.where(m[..., None], o, ray_o)
            ray_d = jnp.where(m[..., None], d, ray_d)
            normal = jnp.where(m[..., None], d, normal)
            pdf_dir = jnp.where(m, 1.0, pdf_dir)
            pdf_pos = jnp.where(m, tgather(scene.emit_inv_area, eid), pdf_pos)
    return ray_o, ray_d, pdf_pos, pdf_dir, normal


def eval_le(scene, eid, inci_dir, normal):
    """Area-light radiance toward -inci_dir (abtract_source.py:210-218)."""
    is_area = tgather(scene.emit_kind, eid) == EmitterTag.AREA
    dot_light = -dot(normalize(inci_dir), normal)
    lit = is_area & (dot_light > 0.0)
    return jnp.where(lit[..., None], tgather(scene.emit_intensity, eid), 0.0)


def solid_angle_pdf(scene, eid, n_s, depth, incid_dir):
    """Area pdf -> solid-angle pdf for hitting an area light
    (abtract_source.py:220-232)."""
    area_pdf = jnp.where(tgather(scene.emit_kind, eid) == EmitterTag.AREA,
                         tgather(scene.emit_inv_area, eid), 0.0)
    dot_res = jnp.abs(dot(incid_dir, n_s))
    return jnp.where(dot_res > 0.0,
                     area_pdf * depth * depth / jnp.maximum(dot_res, 1e-12),
                     0.0)


def direction_pdf(scene, cfg, eid, exit_dir, light_n):
    """Solid-angle pdf of sample_le directions (abtract_source.py:234-244)."""
    kind = tgather(scene.emit_kind, eid)
    pdf = jnp.zeros(eid.shape, jnp.float32)
    for k in cfg.emitter_kinds:
        m = kind == k
        if k == EmitterTag.POINT:
            pdf = jnp.where(m, INV_PI * 0.25, pdf)
        elif k == EmitterTag.SPOT:
            pdf = jnp.where(m, INV_2PI / (1.0 - tgather(scene.emit_r, eid)), pdf)
        elif k == EmitterTag.AREA:
            pdf = jnp.where(
                m, jnp.maximum(dot(exit_dir, light_n), 0.0) * INV_PI, pdf)
    return pdf


def is_delta_pos(scene, eid):
    return (tgather(scene.emit_bits, eid) & BIT_POS_DELTA) > 0
