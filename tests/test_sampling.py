"""Sampler correctness: pdf normalization, support, and moment checks.

Mirrors what the reference only spot-checked manually (SURVEY.md §4):
each sampler's pdf must integrate to 1 over its support and the returned
pdf must match the analytic density of the returned samples.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.ops import sampling
from adapt_tpu.constants import INV_PI, INV_2PI

N = 200_000


def _u(seed, n=N):
    k = jax.random.PRNGKey(seed)
    u = jax.random.uniform(k, (n, 2))
    return u[:, 0], u[:, 1]


def test_cosine_hemisphere():
    u1, u2 = _u(0)
    d, pdf = sampling.cosine_hemisphere(u1, u2)
    d = np.asarray(d)
    assert (d[:, 1] >= -1e-6).all()           # y-up hemisphere
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # pdf = cos(theta)/pi with theta from the y-axis
    assert np.allclose(np.asarray(pdf), d[:, 1] * INV_PI, atol=1e-5)
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(d[:, 1].mean() - 2.0 / 3.0) < 5e-3


def test_uniform_hemisphere():
    u1, u2 = _u(1)
    d, pdf = sampling.uniform_hemisphere(u1, u2)
    d = np.asarray(d)
    assert (d[:, 1] >= -1e-6).all()
    assert np.allclose(np.asarray(pdf), INV_2PI)
    assert abs(d[:, 1].mean() - 0.5) < 5e-3   # E[cos] uniform hemisphere

def test_uniform_sphere():
    u1, u2 = _u(2)
    d, pdf = sampling.uniform_sphere(u1, u2)
    d = np.asarray(d)
    assert np.allclose(np.asarray(pdf), INV_PI * 0.25)
    assert np.abs(d.mean(0)).max() < 5e-3     # centered
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_uniform_cone():
    u1, u2 = _u(3)
    cos_min = 0.8
    d = sampling.uniform_cone(u1, u2, jnp.full(u1.shape, cos_min))
    d = np.asarray(d)
    assert (d[:, 1] >= cos_min - 1e-5).all()
    # E[cos] over uniform solid angle in cone = (1+cos_min)/2
    assert abs(d[:, 1].mean() - (1 + cos_min) / 2) < 5e-3


def test_concentric_disk():
    u1, u2 = _u(4)
    xy = np.asarray(sampling.concentric_disk(u1, u2))
    r2 = (xy ** 2).sum(-1)
    assert (r2 <= 1.0 + 1e-6).all()
    # uniform over disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3
    assert np.abs(xy.mean(0)).max() < 5e-3


def test_sample_triangle_uniform():
    u1, u2 = _u(5)
    dv1 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N, 3))
    dv2 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (N, 3))
    p = np.asarray(sampling.sample_triangle(dv1, dv2, u1, u2))
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] + p[:, 1] <= 1.0 + 1e-5).all()
    # centroid of uniform samples -> (1/3, 1/3)
    assert np.abs(p[:, :2].mean(0) - 1.0 / 3.0).max() < 5e-3


def test_mod_phong_hemisphere():
    u1, u2 = _u(6)
    alpha = 20.0
    d, pdf = sampling.mod_phong_hemisphere(u1, u2, jnp.full(u1.shape, alpha))
    d = np.asarray(d)
    # pdf = (a+1)/2pi cos^a; check against returned cos
    expect = (alpha + 1) * INV_2PI * np.maximum(d[:, 1], 0.0) ** alpha
    assert np.allclose(np.asarray(pdf), expect, rtol=2e-3, atol=1e-5)
    # E[cos] = (a+1)/(a+2)
    assert abs(d[:, 1].mean() - (alpha + 1) / (alpha + 2)) < 5e-3


def test_balance_heuristic():
    w = sampling.balance_heuristic(jnp.array([1.0, 0.0, 2.0]),
                                   jnp.array([1.0, 5.0, 0.0]))
    assert np.allclose(np.asarray(w), [0.5, 0.0, 1.0], atol=1e-5)


def test_phase_hg_normalization():
    """HG phase sampling: E[cos] must equal g (the defining property)."""
    from adapt_tpu.ops.medium_ops import sample_hg, eval_hg
    k = jax.random.PRNGKey(7)
    g = 0.6
    u = jax.random.uniform(k, (N, 2))
    cos_t = np.asarray(sample_hg(jnp.full((N,), g), u[:, 0]))
    assert abs(cos_t.mean() - g) < 5e-3
    # eval over uniform sphere integrates to 1
    d, _ = sampling.uniform_sphere(u[:, 0], u[:, 1])
    ph = np.asarray(eval_hg(jnp.full((N,), g), d[:, 1]))
    assert abs((ph * 4 * np.pi).mean() - 1.0) < 2e-2


def test_phase_hg_backscattering_moments():
    """HG with NEGATIVE g (review r2: the old sign-clamped divisor
    collapsed every g<0 sample to |cos|=1; E[cos] measured +0.75 at
    g=-0.6). The HG first moment is exactly g."""
    from adapt_tpu.ops.medium_ops import sample_hg
    n = 1 << 17
    u = jax.random.uniform(jax.random.PRNGKey(4), (n,))
    for g in (-0.6, -0.2, 0.45):
        c = np.asarray(sample_hg(jnp.full((n,), g, jnp.float32), u))
        assert (np.abs(c) <= 1.0).all()
        assert abs(c.mean() - g) < 0.01, (g, c.mean())
        assert (np.abs(c) > 0.999).mean() < 0.2   # no delta-spike collapse


def test_phase_rayleigh_moments():
    """Rayleigh cosine sampling: E[cos]=0 and E[cos^2]=2/5 analytically
    (pdf ~ 3/8 (1+c^2) on [-1,1] -> second moment (1/3+3/5/3... ) = 0.4)."""
    from adapt_tpu.ops.medium_ops import sample_rayleigh
    n = 1 << 17
    u = jax.random.uniform(jax.random.PRNGKey(5), (n,))
    c = np.asarray(sample_rayleigh(u))
    assert abs(c.mean()) < 0.01
    assert abs((c * c).mean() - 0.4) < 0.01


def test_phase_multi_hg_mixture_consistency():
    """Multi-HG: the returned phase value must equal the mixture density
    of the realized cosine (val doubles as the MIS pdf), and the sampled
    cosines must integrate the mixture: E[cos] = sum_i w_i g_i."""
    from adapt_tpu.ops import medium_ops
    from adapt_tpu.constants import MediumTag
    n = 1 << 16
    key = jax.random.PRNGKey(6)
    u = jax.random.uniform(key, (n, 3))
    par = jnp.broadcast_to(jnp.float32([-0.4, 0.1, 0.7]), (n, 3))
    w = jnp.broadcast_to(jnp.float32([0.5, 0.2, 0.3]), (n, 3))
    kind = jnp.full((n,), MediumTag.MULTI_HG, jnp.int32)
    incid = jnp.broadcast_to(jnp.float32([0, 0, 1]), (n, 3))
    new_dir, val = medium_ops.phase_sample(kind, par, w, incid, u,
                                           (MediumTag.MULTI_HG,))
    cos = np.asarray(jnp.sum(new_dir * incid, -1))
    gbar = float((np.float32([0.5, 0.2, 0.3])
                  * np.float32([-0.4, 0.1, 0.7])).sum())
    assert abs(cos.mean() - gbar) < 0.01, (cos.mean(), gbar)
    # val == mixture density at the realized cosine
    mix = np.asarray(medium_ops.phase_eval(kind, par, w, incid, new_dir,
                                           (MediumTag.MULTI_HG,)))
    np.testing.assert_allclose(np.asarray(val), mix, rtol=1e-4, atol=1e-7)
