"""Vectorized homogeneous-medium + phase-function ops (device side).

Batched equivalents of the reference's Medium/PhaseFunction device structs
(bxdf/medium.py:85-125, bxdf/phase.py:20-81, sampler/phase_sampling.py):
closed-form transmittance, spectral mean-free-path sampling, and
HG / multi-HG / Rayleigh phase sampling & evaluation. All functions take
SoA parameter arrays gathered per-ray from a MediumTable.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import MediumTag
from .math3d import rotate_between_apply, AXIS_Y
from .sampling import random_rgb_channel
from .gather import select_along

_F4PI = 1.0 / (4.0 * jnp.pi)


# ------------------------------ phase functions ------------------------------

def eval_hg(g, cos_t):
    """Henyey-Greenstein phase value (reference phase.py:20-24)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-8)
    return _F4PI * (1.0 - g2) / (denom * jnp.sqrt(denom))


def sample_hg(g, u):
    """Inverse-CDF HG cosine sample (reference phase_sampling.py:16-29).

    The 2g divisor keeps its SIGN: clamping it to +1e-8 broke every
    backscattering (g<0) medium — all samples collapsed to |cos|=1
    (measured E[cos]=+0.75 at g=-0.6). The |g|<1e-4 branch absorbs the
    singular region, so only a sign-preserving tiny-magnitude floor is
    needed elsewhere."""
    g2 = g * g
    safe = lambda x, eps: jnp.where(jnp.abs(x) < eps,
                                    jnp.where(x < 0.0, -eps, eps), x)
    sqr = (1.0 - g2) / safe(1.0 + g - 2.0 * g * u, 1e-8)
    cos_g = (1.0 + g2 - sqr * sqr) / safe(2.0 * g, 1e-8)
    cos_0 = 1.0 - 2.0 * u
    return jnp.where(jnp.abs(g) < 1e-4, cos_0, jnp.clip(cos_g, -1.0, 1.0))


def eval_rayleigh(cos_t):
    """Rayleigh phase value 3/(16pi)(1+cos^2) (reference phase.py:27-29)."""
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_t * cos_t)


def sample_rayleigh(u):
    """Exact inverse-CDF Rayleigh cosine sample
    (reference phase_sampling.py:31-40)."""
    w = 2.0 * u - 1.0
    # solve cubic x^3 + 3x - 4w = 0 via Cardano: x = z - 1/z
    z = jnp.cbrt(2.0 * w + jnp.sqrt(4.0 * w * w + 1.0))
    return jnp.clip(z - 1.0 / z, -1.0, 1.0)


def _local_from_cos(cos_t, u_phi):
    """Unit direction in the y-up local frame with polar cosine cos_t
    (shared spherical helper from the sampler library)."""
    from .sampling import _spherical
    return _spherical(cos_t, 2.0 * jnp.pi * u_phi)


def phase_sample(kind, par, lobe_pdf, incid, u, present_kinds):
    """Sample a new direction from the per-ray phase function.

    kind (N,) MediumTag; par (N,3) phase params; lobe_pdf (N,3) multi-HG lobe
    weights; incid (N,3) incident propagation direction; u (N,3) uniforms.
    Returns (new_dir, phase_value) where phase_value has the sample's phase
    function value (for MIS the pdf equals the value, as in the reference).
    """
    cos_t = 1.0 - 2.0 * u[:, 0]
    val = jnp.full(kind.shape, _F4PI, jnp.float32)
    for k in present_kinds:
        m = kind == k
        if k == MediumTag.HG:
            g = par[:, 0]
            c = sample_hg(g, u[:, 0])
            cos_t = jnp.where(m, c, cos_t)
            val = jnp.where(m, eval_hg(g, c), val)
        elif k == MediumTag.MULTI_HG:
            # pick one of 3 lobes by weight, sample it, eval the mixture
            cdf0 = lobe_pdf[:, 0]
            cdf1 = cdf0 + lobe_pdf[:, 1]
            lobe = (u[:, 2] >= cdf0).astype(jnp.int32) \
                + (u[:, 2] >= cdf1).astype(jnp.int32)
            g_sel = select_along(par, lobe)
            c = sample_hg(g_sel, u[:, 0])
            mix = (lobe_pdf * jnp.stack(
                [eval_hg(par[:, i], c) for i in range(3)], axis=-1)).sum(-1)
            cos_t = jnp.where(m, c, cos_t)
            val = jnp.where(m, mix, val)
        elif k == MediumTag.RAYLEIGH:
            c = sample_rayleigh(u[:, 0])
            cos_t = jnp.where(m, c, cos_t)
            val = jnp.where(m, eval_rayleigh(c), val)
    local = _local_from_cos(cos_t, u[:, 1])
    new_dir = rotate_between_apply(AXIS_Y, incid, local)
    return new_dir, val


def phase_eval(kind, par, lobe_pdf, incid, out, present_kinds):
    """Phase function value for (incid -> out) (reference phase.py:62-81)."""
    cos_t = jnp.sum(incid * out, axis=-1)
    val = jnp.full(kind.shape, _F4PI, jnp.float32)
    for k in present_kinds:
        m = kind == k
        if k == MediumTag.HG:
            val = jnp.where(m, eval_hg(par[:, 0], cos_t), val)
        elif k == MediumTag.MULTI_HG:
            mix = (lobe_pdf * jnp.stack(
                [eval_hg(par[:, i], cos_t) for i in range(3)],
                axis=-1)).sum(-1)
            val = jnp.where(m, mix, val)
        elif k == MediumTag.RAYLEIGH:
            val = jnp.where(m, eval_rayleigh(cos_t), val)
    return val


# --------------------------- homogeneous transport ---------------------------

def transmittance(u_e, is_scattering, depth):
    """Beer-Lambert Tr = exp(-sigma_e d) (reference medium.py:85-87)."""
    tr = jnp.exp(-u_e * depth[..., None])
    return jnp.where(is_scattering[..., None], tr, 1.0)


def sample_mfp(u_e, u_s, is_scattering, max_depth, u):
    """Spectral mean-free-path sampling (reference medium.py:89-108).

    Picks one RGB channel uniformly, samples an exponential flight distance
    with that channel's sigma_e, and weights by the channel-averaged pdf.
    u: (N,2) uniforms. Returns (is_medium_interact, t, beta (N,3)).
    """
    ch_sigma, _ = random_rgb_channel(u[:, 0], u_e)
    ch_sigma = jnp.maximum(ch_sigma, 1e-8)
    t = -jnp.log(jnp.maximum(1.0 - u[:, 1], 1e-12)) / ch_sigma
    in_medium = t < max_depth
    t = jnp.minimum(t, max_depth)
    tr = jnp.exp(-u_e * t[..., None])                       # (N,3)
    # pdf averaged over the 3 channel choices
    pdf_medium = jnp.mean(u_e * tr, axis=-1)
    pdf_surface = jnp.mean(tr, axis=-1)
    beta_medium = tr * u_s / jnp.maximum(pdf_medium, 1e-12)[..., None]
    beta_surface = tr / jnp.maximum(pdf_surface, 1e-12)[..., None]
    beta = jnp.where(in_medium[..., None], beta_medium, beta_surface)
    ok = is_scattering & (max_depth > 0.0)
    return (ok & in_medium,
            jnp.where(ok, t, max_depth),
            jnp.where(ok[..., None], beta, 1.0))
