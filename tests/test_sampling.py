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
