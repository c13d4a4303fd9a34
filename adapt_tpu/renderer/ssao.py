"""Screen-space ambient occlusion renderer (reference renderer/ssao.py).

Two wavefront stages, both batched over all pixels:
  1. depth prepass: averaged primary-hit depth per pixel
     (ssao.py:46-63) — computed once at construction;
  2. AO pass: `smp_hemisphere` uniform-hemisphere offsets around the shading
     normal, re-rasterized into the camera and depth-compared with a
     smooth-step falloff (ssao.py:65-130).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.intersect import ray_intersect
from ..ops.math3d import dot, normalize, norm, delocalize_rotate
from ..ops.sampling import uniform_hemisphere
from .base import ProgressiveRenderer, camera_rays


def _smooth_step(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


@partial(jax.jit, static_argnames=("cfg",))
def depth_prepass(scene, cfg, key):
    """Averaged primary-hit depth map, (N,) (reference ssao.py:46-63)."""
    N = cfg.n_pixels
    acc = jnp.zeros((N,), jnp.float32)
    cnt = jnp.zeros((N,), jnp.float32)

    def body(s, st):
        acc, cnt, key = st
        key, sub = jax.random.split(key)
        ray_o, ray_d = camera_rays(scene, cfg, sub, s)
        it = ray_intersect(scene, cfg, ray_o, ray_d)
        hit = it.is_hit
        return (acc + jnp.where(hit, it.t, 0.0),
                cnt + hit.astype(jnp.float32), key)

    acc, cnt, _ = jax.lax.fori_loop(0, cfg.depth_samples, body,
                                    (acc, cnt, key))
    return acc / jnp.maximum(cnt, 1.0)


@partial(jax.jit, static_argnames=("cfg",))
def render_pass_ssao(scene, cfg, key, cnt, depth_map):
    """One AO sample pass; returns (N,3) occlusion-as-gray."""
    key, cam_key = jax.random.split(key)
    ray_o, ray_d = camera_rays(scene, cfg, cam_key, cnt)
    N = ray_o.shape[0]
    it = ray_intersect(scene, cfg, ray_o, ray_d)
    pos = ray_o + it.t[..., None] * ray_d

    cam_normal = scene.cam_r @ jnp.array([0.0, 0.0, 1.0], jnp.float32)
    half_w, half_h = cfg.w * 0.5, cfg.h * 0.5

    def splat_depth(rd):
        """Rasterize a world direction into the film and query depth
        (reference ssao.py:64-90)."""
        local = rd @ scene.cam_r           # inv rotation (orthonormal)
        z = local[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-9, 1.0, z)
        lx = local[..., 0] / safe_z
        ly = local[..., 1] / safe_z
        pi = (half_w + 1.0 - lx * cfg.focal).astype(jnp.int32)
        pj = (half_h + 1.0 + ly * cfg.focal).astype(jnp.int32)
        ok = (dot(rd, cam_normal) > 0.0) & (z > 0.0) \
            & (pi >= cfg.start_x) & (pi < cfg.end_x) \
            & (pj >= cfg.start_y) & (pj < cfg.end_y)
        flat = jnp.clip(pi, 0, cfg.w - 1) * cfg.h + jnp.clip(pj, 0,
                                                             cfg.h - 1)
        return jnp.where(ok, depth_map[flat], 0.0)

    def ao_sample(s, st):
        occ, key = st
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (N, 2))
        local_dir, _ = uniform_hemisphere(u[:, 0], u[:, 1])
        world_dir = delocalize_rotate(it.n_s, local_dir)
        sample_p = pos + world_dir * cfg.sample_extent
        rd = sample_p - scene.cam_t[None, :]
        depth = norm(rd)
        rd = rd / jnp.maximum(depth[..., None], 1e-12)
        queried = splat_depth(rd) + 1e-3
        occluded = (depth >= queried).astype(jnp.float32) * _smooth_step(
            0.0, 1.0, cfg.sample_extent / jnp.maximum(
                jnp.abs(queried - depth), 1e-9))
        return occ + occluded, key

    occ, _ = jax.lax.fori_loop(0, cfg.smp_hemisphere, ao_sample,
                               (jnp.zeros((N,), jnp.float32), key))
    ao = 1.0 - occ / cfg.smp_hemisphere
    ao = jnp.where(it.is_hit, ao, 0.0)
    return jnp.broadcast_to(ao[..., None], (N, 3))


class SSAORenderer(ProgressiveRenderer):
    """SSAO final class (reference ssao.py:27)."""

    def __init__(self, scene, cfg, seed: int = 0):
        super().__init__(scene, cfg, seed)
        self.key, sub = jax.random.split(self.key)
        self.depth_map = depth_prepass(scene, cfg, sub)

    def render_pass(self, key, cnt):
        return render_pass_ssao(self.scene, self.cfg, key,
                                jnp.asarray(cnt, jnp.int32), self.depth_map)
