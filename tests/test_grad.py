"""Differentiable rendering: jax.grad through the PT estimator.

The reference ATTEMPTED inverse rendering and abandoned it (its `ad`
branch: "strange exceptions", README.md "Other branches" — Taichi autodiff
through the megakernel never worked). The rebuild gets it structurally:
scene tables are jnp pytree leaves and every integrator is a pure
function, so radiance is differentiable w.r.t. albedo / emitter intensity
with NO renderer changes. Fixed RNG keys (common random numbers) make the
Monte Carlo estimate deterministic, so finite differences are well-posed
and the gradient is checked against them directly.

See docs/differentiable.md for the user-facing walkthrough.
"""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import SCENE_DIR


@pytest.fixture(scope="module")
def cbox_small():
    from adapt_tpu.scene.compile import load_scene
    scene, cfg, _ = load_scene(os.path.join(SCENE_DIR, "cbox"), "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=24, h=24, focal=cfg.focal * 24 / 512, end_x=24, end_y=24,
        max_bounce=3, use_rr=False,           # RR kills are discontinuous
        anti_alias=False, stratified_sampling=False)
    return scene, cfg


def _loss_fn(scene, cfg):
    from adapt_tpu.renderer.pt import render_batch_pt
    key = jax.random.PRNGKey(42)

    def loss(kd_scale, emit_scale):
        s = dataclasses.replace(
            scene,
            mat_kd=scene.mat_kd * kd_scale,
            emit_intensity=scene.emit_intensity * emit_scale)
        img = render_batch_pt(s, cfg, key, jnp.int32(1), 2)
        return jnp.mean(img)

    return loss


def test_grad_matches_finite_differences(cbox_small):
    """d(mean radiance)/d(albedo scale, emitter scale) == central FD."""
    scene, cfg = cbox_small
    loss = _loss_fn(scene, cfg)
    g_kd, g_emit = jax.jit(jax.grad(loss, argnums=(0, 1)))(1.0, 1.0)
    h = 1e-2
    fd_kd = (loss(1.0 + h, 1.0) - loss(1.0 - h, 1.0)) / (2 * h)
    fd_emit = (loss(1.0, 1.0 + h) - loss(1.0, 1.0 - h)) / (2 * h)
    assert float(g_kd) > 0.0 and float(g_emit) > 0.0
    np.testing.assert_allclose(float(g_kd), float(fd_kd), rtol=2e-2)
    np.testing.assert_allclose(float(g_emit), float(fd_emit), rtol=2e-2)
    # emitter intensity is linear in the estimate: grad == loss at 0-offset
    # slope, i.e. loss(1,s)/s is constant => g_emit == loss(1,1) exactly
    np.testing.assert_allclose(float(g_emit), float(loss(1.0, 1.0)),
                               rtol=1e-5)


def test_grad_per_object_albedo(cbox_small):
    """Per-object albedo gradients: jax.grad w.r.t. the full (O,3) table
    is nonzero exactly for objects visible to transport, and one entry
    matches its finite difference."""
    scene, cfg = cbox_small
    from adapt_tpu.renderer.pt import render_batch_pt
    key = jax.random.PRNGKey(7)

    def loss(mat_kd):
        s = dataclasses.replace(scene, mat_kd=mat_kd)
        return jnp.mean(render_batch_pt(s, cfg, key, jnp.int32(1), 2))

    g = jax.jit(jax.grad(loss))(scene.mat_kd)
    g = np.asarray(g)
    assert g.shape == scene.mat_kd.shape
    assert (g >= -1e-6).all()          # radiance is monotone in albedo
    # the brightest-gradient object: check against FD on one channel
    o, c = np.unravel_index(np.argmax(g), g.shape)
    h = 5e-3
    e = jnp.zeros_like(scene.mat_kd).at[o, c].set(h)
    fd = (loss(scene.mat_kd + e) - loss(scene.mat_kd - e)) / (2 * h)
    np.testing.assert_allclose(g[o, c], float(fd), rtol=3e-2)


def test_inverse_rendering_recovers_albedo(cbox_small):
    """Three-parameter toy inverse problem: gradient descent on an albedo
    scale recovers the value that produced a target render."""
    scene, cfg = cbox_small
    loss = _loss_fn(scene, cfg)
    target = float(loss(0.7, 1.0))

    def objective(s):
        return (loss(s, 1.0) - target) ** 2

    vg = jax.jit(jax.value_and_grad(objective))
    s = 1.0
    for _ in range(40):
        val, g = vg(s)
        s = s - 2.0 * float(g)
    assert abs(s - 0.7) < 0.02, s
