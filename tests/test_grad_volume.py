"""Differentiable DENSITY-GRID recovery through the tracking estimator.

Extends the differentiable axis beyond scalars (r4 verdict #7): recover
a full voxel grid by gradient descent through eval_tr_ratio_tracking —
the same null-collision machinery the VPT renderer uses.

Soundness: the majorant field is held constant (and covers every grid
the optimizer can propose), so the candidate point process is
independent of the density parameters; the pathwise gradient of the
ratio factors (1 - d/maj) is then an unbiased estimator of the gradient
of expected transmittance. Common random numbers (same key for estimate
and target) make the loss deterministic, so finite differences are
well-posed and jax.grad is checked against them directly.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.constants import VolumeTag
from adapt_tpu.ops import volume_ops

A = 0.15          # peak density; optical depth <= ~1.2 keeps the
#                   tracker's tr-RR (tr < 0.1) from ever firing, so the
#                   estimator is smooth in the density parameters
BOUND = A * 1.3   # fixed majorant bound (covers any sigmoid proposal)
R = 12            # grid edge (voxels); world == local == [0, R]^3


# constant majorant field, computed OUTSIDE any trace (pure numpy)
_S_SV, _SV = volume_ops._supervoxel_majorants(
    np.full((3, R, R, R), BOUND, np.float32))


def _make_vol(grid_1ch):
    g = jnp.broadcast_to(grid_1ch[None], (3, R, R, R)).astype(jnp.float32)
    S, sv = _S_SV, _SV
    z3 = jnp.zeros(3, jnp.float32)
    maj = jnp.full((3,), BOUND, jnp.float32)
    return volume_ops.GridVolumeData(
        grid=g, albedo=jnp.ones(3), inv_T=jnp.eye(3), trans=z3,
        mini=z3, maxi=jnp.full((3,), float(R)),
        majorant=maj, pdf=maj / maj.sum(), ph_par=z3,
        ph_pdf=jnp.array([1.0, 0.0, 0.0]),
        sv_maj=jnp.asarray(sv), sv_size=int(S))


def _true_grid():
    ax = (np.arange(R) + 0.5 - R / 2) / (R / 3)
    r2 = (ax[:, None, None] ** 2 + ax[None, :, None] ** 2
          + ax[None, None, :] ** 2)
    return jnp.asarray(A * np.exp(-r2).astype(np.float32))


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    # origins on the -x face plane, directions fanning through the cube
    o = np.stack([np.full(n, -2.0), rng.uniform(0, R, n),
                  rng.uniform(0, R, n)], -1).astype(np.float32)
    tgt = np.stack([np.full(n, R + 2.0), rng.uniform(0, R, n),
                    rng.uniform(0, R, n)], -1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(autouse=True)
def diff_mode(monkeypatch):
    monkeypatch.setattr(volume_ops, "DIFF_STEPS", 64)


def _tr(grid_1ch, ro, rd, key):
    vol = _make_vol(grid_1ch)
    # majorants constant by construction; stop_gradient documents intent
    vol = dataclasses.replace(
        vol, sv_maj=jax.lax.stop_gradient(vol.sv_maj),
        majorant=jax.lax.stop_gradient(vol.majorant))
    n = ro.shape[0]
    tr3 = volume_ops.eval_tr_ratio_tracking(
        vol, int(VolumeTag.MONO), key, ro, rd,
        jnp.ones((n, 3)), jnp.full((n,), 100.0))
    return tr3[:, 0]


def test_grid_grad_matches_finite_differences():
    ro, rd = _rays(256, seed=1)
    key = jax.random.PRNGKey(7)
    true = _true_grid()
    probe = jnp.asarray(np.random.default_rng(3).uniform(
        -1, 1, (R, R, R)).astype(np.float32))

    def scalar_loss(eps):
        g = jnp.clip(true + eps * probe * 0.02, 0.0, BOUND)
        return jnp.mean(_tr(g, ro, rd, key))

    g_ad = jax.grad(scalar_loss)(0.0)
    h = 0.05
    g_fd = (scalar_loss(h) - scalar_loss(-h)) / (2 * h)
    # CRN + fixed majorants: the estimator is piecewise-smooth in eps
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_fd),
                               rtol=5e-2, atol=1e-5)


def test_gradient_descent_recovers_density_grid():
    ro, rd = _rays(4096, seed=2)
    true = _true_grid()
    key0 = jax.random.PRNGKey(11)

    def loss(raw, key):
        g = jax.nn.sigmoid(raw) * BOUND
        est = _tr(g, ro, rd, key)
        tgt = _tr(jax.lax.stop_gradient(true), ro, rd, key)  # CRN target
        return jnp.mean((est - tgt) ** 2)

    import optax
    vg = jax.jit(jax.value_and_grad(loss))
    raw = jnp.zeros((R, R, R), jnp.float32) - 1.0     # init ~0.27*BOUND
    opt = optax.adam(0.15)
    st = opt.init(raw)
    for step in range(200):
        _l, g = vg(raw, jax.random.fold_in(key0, step))
        up, st = opt.update(g, st)
        raw = raw + up
    rec = np.asarray(jax.nn.sigmoid(raw) * BOUND)
    tr_np = np.asarray(true)
    # judge the recovery away from the boundary voxels (rarely sampled)
    sl = slice(2, R - 2)
    err = np.abs(rec - tr_np)[sl, sl, sl].mean()
    assert err < 0.05 * A, err        # measured 4.3e-5 vs A = 0.15
    c = np.corrcoef(rec[sl, sl, sl].ravel(), tr_np[sl, sl, sl].ravel())[0, 1]
    assert c > 0.99, c                # measured 0.99999
