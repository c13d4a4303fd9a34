"""Renderer base: camera rays, film accumulation, progressive host loop.

Functional core + a thin stateful host wrapper that mirrors the reference's
progressive-rendering API (render.py:115-152, tracer/tracer_base.py:136-157):
each `render()` call adds one sample per pixel into an accumulation buffer;
`pixels` returns the running average.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.math3d import normalize

_EPS = 1e-4
_INV_EPS = 1.0 - 2.0 * _EPS


def camera_rays(scene, cfg, key, cnt, pix_ids=None):
    """Generate one primary ray per pixel; returns (ray_o, ray_d) of (N,3).

    Pixel layout is x-major: flat index = i * h + j with i in [0,w) (x) and
    j in [0,h) (y), matching the reference's (w, h) pixel field. The pinhole
    model and jitter modes mirror tracer_base.py:136-157.

    pix_ids: optional (N,) flat pixel indices to generate rays for a pixel
    shard only (multi-chip path, parallel/sharding.py); default all pixels."""
    w, h = cfg.w, cfg.h
    if pix_ids is None:
        i = jax.lax.broadcasted_iota(jnp.float32, (w, h), 0).reshape(-1)
        j = jax.lax.broadcasted_iota(jnp.float32, (w, h), 1).reshape(-1)
    else:
        i = (pix_ids // h).astype(jnp.float32)
        j = (pix_ids % h).astype(jnp.float32)
    n = i.shape[0]
    if cfg.anti_alias:
        u = jax.random.uniform(key, (n, 2))
        if cfg.stratified_sampling:
            mod_val = jnp.asarray(cnt % 16, jnp.float32)
            vx = jnp.floor(mod_val % 4.0) * 0.25 + u[:, 0] * 0.25
            vy = jnp.floor(mod_val / 4.0) * 0.25 + u[:, 1] * 0.25
        else:
            vx = u[:, 0] * _INV_EPS + _EPS
            vy = u[:, 1] * _INV_EPS + _EPS
    else:
        vx = jnp.full((n,), 0.5, jnp.float32)
        vy = jnp.full((n,), 0.5, jnp.float32)
    inv_focal = 1.0 / cfg.focal
    cam_dir = jnp.stack([
        (0.5 * w + vx - i) * inv_focal,
        (j - 0.5 * h - vy) * inv_focal,
        jnp.ones((n,), jnp.float32)], axis=-1)
    ray_d = normalize(cam_dir) @ scene.cam_r.T
    ray_o = jnp.broadcast_to(scene.cam_t, (n, 3))
    return ray_o, ray_d


def crop_mask(cfg):
    """Boolean (N,) mask of pixels inside the crop window (or all True)."""
    w, h = cfg.w, cfg.h
    if (cfg.start_x, cfg.end_x, cfg.start_y, cfg.end_y) == (0, w, 0, h):
        return None
    i = np.arange(w)[:, None]
    j = np.arange(h)[None, :]
    m = ((i >= cfg.start_x) & (i < cfg.end_x)
         & (j >= cfg.start_y) & (j < cfg.end_y))
    return jnp.asarray(m.reshape(-1))


def crop_pix_ids(cfg):
    """Flat pixel ids (i*h + j) of the crop window, or None when no crop.

    The reference only traces within the crop range (tracer_base.py:39-55)
    — its crop mechanism exists precisely to make deep-path transient BDPT
    affordable; wavefront renderers restrict their pixel wavefront to these
    ids instead of masking a full-film pass."""
    w, h = cfg.w, cfg.h
    if (cfg.start_x, cfg.end_x, cfg.start_y, cfg.end_y) == (0, w, 0, h):
        return None
    i = np.arange(cfg.start_x, cfg.end_x)[:, None]
    j = np.arange(cfg.start_y, cfg.end_y)[None, :]
    return jnp.asarray((i * h + j).reshape(-1).astype(np.int32))


class ProgressiveRenderer:
    """Stateful host wrapper with the reference's incremental-display API."""

    def __init__(self, scene, cfg, seed: int = 0):
        self.scene = scene
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)
        self.color = jnp.zeros((cfg.w, cfg.h, 3), jnp.float32)  # accumulation
        self.cnt = 0

    # --- subclasses provide a jitted pass function ---
    def render_pass(self, key, cnt):
        raise NotImplementedError

    def render(self, *_args):
        """One progressive iteration: +1 spp into the accumulator."""
        self.cnt += 1
        self.key, sub = jax.random.split(self.key)
        radiance = self.render_pass(sub, self.cnt)          # (w*h, 3)
        radiance = jnp.nan_to_num(radiance, nan=0.0)
        self.color = self.color + radiance.reshape(self.cfg.w, self.cfg.h, 3)
        return self.color

    def render_batch(self, spp: int):
        """Accumulate `spp` samples; subclasses with a fused multi-spp
        kernel override this (one device dispatch instead of spp)."""
        for _ in range(spp):
            self.render()
        return self.color

    @property
    def pixels(self):
        """Running average, (w, h, 3)."""
        return self.color / max(self.cnt, 1)

    def image(self) -> np.ndarray:
        """Averaged frame as (h, w, 3) float32 numpy (row-major image).

        The film buffer is (w, h) with y-up (reference pixel-field layout);
        images are row-major y-down, hence the transpose + vertical flip
        (same mapping as taichi's imwrite used by the reference)."""
        return np.asarray(jnp.swapaxes(self.pixels, 0, 1))[::-1]

    # --- checkpointing (reference path_tracer.py:181-211) ---
    # The reference validates film size, crop window, focal and counts on
    # load (path_tracer.py:195-211); we additionally pin the renderer type
    # so a 'pt' checkpoint cannot silently resume into a 'bdpt' run.
    _CHECK_KEYS = ("w", "h", "focal", "max_bounce",
                   "start_x", "end_x", "start_y", "end_y")

    def get_check_point(self) -> dict:
        chk = {k: getattr(self.cfg, k) for k in self._CHECK_KEYS}
        chk.update({
            "renderer": type(self).__name__,
            "accumulation": np.asarray(self.color),
            "counter": self.cnt,
            "key": np.asarray(jax.random.key_data(self.key)),
        })
        return chk

    def load_check_point(self, chk: dict):
        want = type(self).__name__
        got = chk.get("renderer", want)
        if got != want:
            raise ValueError(
                f"checkpoint was written by renderer '{got}', cannot "
                f"resume into '{want}'")
        for k in self._CHECK_KEYS:
            if k in chk and chk[k] != getattr(self.cfg, k):
                raise ValueError(
                    f"checkpoint mismatch on '{k}': saved {chk[k]!r}, "
                    f"current config {getattr(self.cfg, k)!r}")
        self.color = jnp.asarray(chk["accumulation"])
        self.cnt = int(chk["counter"])
        self.key = jax.random.wrap_key_data(jnp.asarray(chk["key"]))
