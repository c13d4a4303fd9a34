"""Direct Blinn-Phong preview tracer (reference renderer/direct_render.py).

One wavefront pass: primary intersect -> Blinn-Phong shading from the first
point light with a hard shadow ray. Depth and normal maps are exposed as
side outputs (direct_render.py:26-134 semantics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import bxdf_ops
from ..ops.intersect import ray_intersect, does_intersect
from ..ops.math3d import dot, normalize, norm
from .base import ProgressiveRenderer, camera_rays


@partial(jax.jit, static_argnames=("cfg",))
def render_pass_direct(scene, cfg, key, cnt):
    ray_o, ray_d = camera_rays(scene, cfg, key, cnt)
    N = ray_o.shape[0]
    it = ray_intersect(scene, cfg, ray_o, ray_d)
    hit_p = ray_o + it.t[..., None] * ray_d

    light_p = scene.emit_pos[0]
    light_int = scene.emit_intensity[0]
    to_l = light_p[None, :] - hit_p
    d = norm(to_l)
    ld = to_l / jnp.maximum(d[..., None], 1e-12)
    shadowed = does_intersect(scene, cfg, hit_p, ld, d)

    mat = bxdf_ops.gather_mat(scene, it.obj_id)
    half = normalize(ld - ray_d)
    cos_n = jnp.maximum(dot(it.n_s, ld), 0.0)
    spec_cos = jnp.maximum(dot(it.n_s, half), 0.0)
    shininess = jnp.maximum(mat.kg[:, 0], 1.0)
    atten = jnp.minimum(1.0 / jnp.maximum(d * d, 1e-5), 1.0)
    diffuse = mat.kd * cos_n[..., None]
    specular = mat.ks * (spec_cos[..., None] ** shininess[..., None])
    color = (diffuse + specular) * light_int[None, :] * atten[..., None]
    color = jnp.where((it.is_hit & ~shadowed)[..., None], color, 0.0)

    depth = jnp.where(it.is_hit, it.t, 0.0)
    normal = jnp.where(it.is_hit[..., None], it.n_s * 0.5 + 0.5, 0.0)
    return color, depth, normal


class DirectRenderer(ProgressiveRenderer):
    """Blinn-Phong direct-light preview (reference direct_render.py:26)."""

    def __init__(self, scene, cfg, seed: int = 0):
        super().__init__(scene, cfg, seed)
        self.depth = jnp.zeros((cfg.w, cfg.h), jnp.float32)
        self.normal = jnp.zeros((cfg.w, cfg.h, 3), jnp.float32)

    def render_pass(self, key, cnt):
        color, depth, normal = render_pass_direct(self.scene, self.cfg, key,
                                                  jnp.asarray(cnt, jnp.int32))
        self.depth = depth.reshape(self.cfg.w, self.cfg.h)
        self.normal = normal.reshape(self.cfg.w, self.cfg.h, 3)
        return color
