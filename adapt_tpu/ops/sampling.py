"""Vectorized direction sampling (device side).

All samplers are *pure*: uniforms come in as explicit arrays so the RNG
schedule stays at the integrator level and runs are reproducible. Local
frames are y-up, matching the reference (sampler/general_sampling.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import INV_PI, INV_2PI, INV_4PI, PI2, PI_DIV2, PI_DIV4
from .gather import select_along


def _spherical(cos_theta, phi):
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return jnp.stack([jnp.cos(phi) * sin_theta, cos_theta,
                      jnp.sin(phi) * sin_theta], axis=-1)


def cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere around +y; returns (dir, pdf)."""
    cos_theta = jnp.sqrt(u1)
    phi = PI2 * u2
    return _spherical(cos_theta, phi), cos_theta * INV_PI


def uniform_hemisphere(u1, u2):
    cos_theta = u1
    phi = PI2 * u2
    return _spherical(cos_theta, phi), jnp.full_like(u1, INV_2PI)


def uniform_sphere(u1, u2):
    cos_theta = 2.0 * u1 - 1.0
    phi = PI2 * u2
    return _spherical(cos_theta, phi), jnp.full_like(u1, INV_4PI)


def uniform_cone(u1, u2, cos_range):
    """Uniform direction in a cone around +y (cos in [cos_range, 1])."""
    cos_theta = 1.0 - u1 + cos_range * u1
    phi = PI2 * u2
    return _spherical(cos_theta, phi)


def mod_phong_hemisphere(u1, u2, alpha):
    """Lafortune-Willems modified-Phong lobe around +y; (dir, pdf)."""
    cos_theta = jnp.power(u1, 1.0 / (alpha + 1.0))
    phi = PI2 * u2
    pdf = 0.5 * (1.0 + alpha) * jnp.power(cos_theta, alpha) * INV_PI
    return _spherical(cos_theta, phi), pdf


def fresnel_hemisphere(u1, u2, nu, nv):
    """Ashikhmin-Shirley anisotropic half-vector sample; (dir, power_coeff).

    Reference: sampler/general_sampling.py:95-108."""
    eps1 = u1 * 4.0
    inner = eps1 - jnp.floor(eps1)
    tan_phi = jnp.sqrt((nu + 1.0) / (nv + 1.0)) * jnp.tan(0.5 * jnp.pi * inner)
    cos_phi2 = 1.0 / (1.0 + tan_phi * tan_phi)
    sin_phi2 = 1.0 - cos_phi2
    cos_phi = jnp.sqrt(cos_phi2)
    cos_phi = jnp.where((eps1 > 1.0) & (eps1 <= 3.0), -cos_phi, cos_phi)
    sin_phi = jnp.sqrt(sin_phi2) * jnp.sign(2.0 - eps1)
    power_coeff = nu * cos_phi2 + nv * sin_phi2
    cos_theta = jnp.power(1.0 - u2, 1.0 / (power_coeff + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    d = jnp.stack([cos_phi * sin_theta, cos_theta, sin_phi * sin_theta],
                  axis=-1)
    return d, power_coeff


def concentric_disk(u1, u2):
    """Concentric disk sample in the y=0 plane; returns (..., 3)."""
    ox = u1 * 2.0 - 1.0
    oy = u2 * 2.0 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(use_x, PI_DIV4 * (oy / safe_ox),
                      PI_DIV2 - PI_DIV4 * (ox / safe_oy))
    r = jnp.where(use_x, ox, oy)
    out = jnp.stack([r * jnp.cos(theta), jnp.zeros_like(r),
                     r * jnp.sin(theta)], axis=-1)
    return jnp.where(((ox == 0.0) | (oy == 0.0))[..., None], 0.0, out)


def sample_triangle(dv1, dv2, u1, u2):
    """Uniform point on a triangle spanned by edge vectors dv1, dv2
    (offset from the triangle origin vertex)."""
    u1e = u1[..., None]
    u2e = u2[..., None]
    pt = dv1 * u1e + dv2 * u2e
    flip = (u1 + u2 > 1.0)[..., None]
    return jnp.where(flip, dv1 + dv2 - pt, pt)


def balance_heuristic(pdf_a, pdf_b):
    """Two-sample MIS balance heuristic; 0 when pdf_a ~ 0
    (reference sampler/general_sampling.py:120-123)."""
    return jnp.where(pdf_a > 1e-7, pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-12),
                     0.0)


def random_rgb_channel(u, vector):
    """Pick one RGB channel uniformly; returns (value, channel_idx).

    Mirrors reference general_sampling.py:16-27 (value floored at 1e-5)."""
    idx = jnp.minimum((u * 3.0).astype(jnp.int32), 2)
    val = select_along(vector, idx)
    return jnp.maximum(val, 1e-5), idx
