"""Grid-volume transport validation with analytic oracles.

A *uniform*-density grid volume is exactly a homogeneous medium, so
delta-tracking collision statistics and ratio-tracking transmittance must
match Beer-Lambert closed forms.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.native import write_vol, vol_file_to_numpy
from adapt_tpu.ops import volume_ops

SIGMA = 0.25
RES = 16


@pytest.fixture(scope="module")
def uniform_vol():
    grid = jnp.full((3, RES, RES, RES), SIGMA, jnp.float32)  # channel-major
    maj = np.full(3, SIGMA * 1.05, np.float32)
    sv_size, sv = volume_ops._supervoxel_majorants(np.asarray(grid))
    return volume_ops.GridVolumeData(
        grid=grid, albedo=jnp.full(3, 0.9), inv_T=jnp.eye(3),
        trans=jnp.zeros(3), mini=jnp.zeros(3) - 0.01,
        maxi=jnp.full(3, float(RES)) + 0.01,
        majorant=jnp.asarray(maj), pdf=jnp.asarray(maj / maj.sum()),
        ph_par=jnp.full(3, 0.5), ph_pdf=jnp.array([1.0, 0.0, 0.0]),
        sv_maj=jnp.asarray(sv), sv_size=sv_size)


# per-channel extinctions for the spectral (RGB, kind=2) oracle
SIGMA_RGB = np.float32([0.1, 0.3, 0.6])


@pytest.fixture(scope="module")
def rgb_vol():
    grid = jnp.broadcast_to(
        jnp.asarray(SIGMA_RGB)[:, None, None, None],
        (3, RES, RES, RES)).astype(jnp.float32)
    maj = SIGMA_RGB * 1.05
    sv_size, sv = volume_ops._supervoxel_majorants(np.asarray(grid))
    return volume_ops.GridVolumeData(
        grid=grid, albedo=jnp.full(3, 0.9), inv_T=jnp.eye(3),
        trans=jnp.zeros(3), mini=jnp.zeros(3) - 0.01,
        maxi=jnp.full(3, float(RES)) + 0.01,
        majorant=jnp.asarray(maj), pdf=jnp.asarray(maj / maj.sum()),
        ph_par=jnp.full(3, 0.5), ph_pdf=jnp.array([1.0, 0.0, 0.0]),
        sv_maj=jnp.asarray(sv), sv_size=sv_size)


def _rays(n):
    # chords along +x through the volume interior
    rng = np.random.RandomState(0)
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = -1.0
    o[:, 1] = rng.uniform(2, RES - 2, n)
    o[:, 2] = rng.uniform(2, RES - 2, n)
    d = np.tile(np.float32([1, 0, 0]), (n, 1))
    return jnp.asarray(o), jnp.asarray(d)


# Effective chord of the stochastic-NN density field: the lookup
# idx=floor(x+u-0.5) (reference volume.py:307-314) falls outside the grid
# with prob (0.5-x) in the half-voxel face shells, so E[d(x)]/sigma ramps
# linearly x+0.5 over x in [0,0.5); by Campbell's theorem the Poisson-mark
# product estimator has E[Tr] = exp(-sigma * int E[d]/sigma dx) exactly,
# and each shell integrates to 0.375 -> L_eff = (RES-1) + 2*0.375.
# (The previous oracle used RES-1 — an error of exp(0.75*sigma) that sat
# inside the old 8% gate only by sampling luck.)
L_EFF = RES - 0.25


def test_ratio_tracking_matches_beer_lambert(uniform_vol):
    # deep-Tr regime (Tr ~ 0.02, RR-dominated): single-seed estimates
    # scatter up to ~12% around the analytic value (measured over 12
    # seeds, and the analytic L_EFF itself ignores the stochastic-NN
    # boundary jitter), so average seeds and bound honestly
    n = 32768
    o, d = _rays(n)
    ests = []
    for s in range(3):
        tr = volume_ops.eval_tr_ratio_tracking(
            uniform_vol, 1, jax.random.PRNGKey(s), o, d,
            jnp.ones((n, 3)), jnp.full((n,), RES + 2.0))
        ests.append(float(np.asarray(tr).mean()))
    expect = np.exp(-SIGMA * L_EFF)
    got = float(np.mean(ests))
    assert abs(got - expect) / expect < 0.12, (got, ests, expect)


def test_ratio_tracking_rgb_spectral_oracle(rgb_vol):
    """The spectral path (kind=2): throughput-weighted channel pick +
    one-hot Tr/pdf division must give E[tr_k] = exp(-sigma_k * L_eff)
    PER CHANNEL for unequal extinctions — the mono tests cannot see a
    wrong-channel pdf or a dropped /pdf (channel choice cancels there)."""
    n = 1 << 17
    o, d = _rays(n)
    tr = np.asarray(volume_ops.eval_tr_ratio_tracking(
        rgb_vol, 2, jax.random.PRNGKey(3), o, d,
        jnp.ones((n, 3)), jnp.full((n,), RES + 2.0)))
    expect = np.exp(-SIGMA_RGB * L_EFF)
    got = tr.mean(axis=0)
    # per-channel tolerance from the measured standard error: channel
    # pick rates (pdf ~ sigma_k) and near-zero Tr tails make a fixed
    # relative bound seed-fragile (the high-sigma channel's E[tr]~8e-5
    # rides on a handful of surviving samples)
    se = tr.std(axis=0) / np.sqrt(n)
    err = np.abs(got - expect)
    assert (err < 4.0 * se + 1e-7).all(), (got, expect, se)


def test_delta_tracking_rgb_beta_expectation(rgb_vol):
    """Delta tracking on the RGB volume, against the ESTIMATOR's exact
    closed form. A collision in channel j yields beta = one-hot_j *
    albedo/p_j; NO collision yields beta = 1 broadcast over all channels
    regardless of the sampled one (the reference caller ignores beta
    unless result[3] > 0, vpt.py:96 — a kept parity quirk that couples
    channels). Hence per channel k (homogeneous density sigma_j, pick
    probs p_j = maj_j / sum):

        E[beta_k] = sum_j p_j exp(-sigma_j L) + albedo (1 - exp(-sigma_k L))
    """
    n = 1 << 17
    o, d = _rays(n)
    t, beta = volume_ops.sample_distance_delta_tracking(
        rgb_vol, 2, jax.random.PRNGKey(9), o, d, jnp.ones((n, 3)),
        jnp.full((n,), RES + 2.0))
    beta = np.asarray(beta)
    p = SIGMA_RGB / SIGMA_RGB.sum()           # 1.05 majorant scale cancels
    no_hit = np.exp(-SIGMA_RGB * L_EFF)
    expect = (p * no_hit).sum() + 0.9 * (1.0 - no_hit)
    got = beta.mean(axis=0)
    rel = np.abs(got - expect) / expect
    assert (rel < 0.12).all(), (got, expect)


def test_delta_tracking_collision_statistics(uniform_vol):
    n = 32768
    o, d = _rays(n)
    t, beta = volume_ops.sample_distance_delta_tracking(
        uniform_vol, 1, jax.random.PRNGKey(1), o, d,
        jnp.ones((n, 3)), jnp.full((n,), RES + 2.0))
    t = np.asarray(t)
    # escape probability = exp(-sigma * effective chord), L_EFF as above
    p_escape = float((t < 0).mean())
    expect = np.exp(-SIGMA * L_EFF)
    assert abs(p_escape - expect) < 0.01, (p_escape, expect)
    # collision depths are Exp(sigma) truncated at the effective chord;
    # E[T | T < L] = 1/sigma - L exp(-sigma L)/(1 - exp(-sigma L)),
    # shifted by the half-voxel entry shell
    depth = t[t > 0] - 1.0
    L = float(RES - 1)
    e = np.exp(-SIGMA * L)
    expect_mean = 1 / SIGMA - L * e / (1 - e)
    # the half-voxel density ramp at the entry face shifts the mean by a
    # fraction of a voxel; allow for it
    assert abs(depth.mean() - expect_mean) < 0.25, (depth.mean(),
                                                    expect_mean)
    # collision beta = albedo / 1 (mono): Tr * albedo
    b = np.asarray(beta)[t > 0]
    assert np.allclose(b, 0.9, atol=1e-5)


def test_vpt_with_grid_volume(tmp_path):
    """End-to-end: a smoke blob inside the cornell box renders finite and
    adds in-scattering where the volume sits."""
    import dataclasses
    import xml.etree.ElementTree as xet
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.vpt import render_pass_vpt

    # synthetic gaussian blob volume
    res = 24
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, res)] * 3),
                             indexing="ij")
    blob = np.exp(-6 * (xx ** 2 + yy ** 2 + zz ** 2)).astype(np.float32) * 4
    vol_path = str(tmp_path / "blob.vol")
    write_vol(vol_path, blob)

    scene_dir = os.path.join(os.path.dirname(__file__), "..", "scenes",
                             "cbox")
    tree = xet.parse(os.path.join(scene_dir, "cbox.xml"))
    root = tree.getroot()
    vol = xet.SubElement(root, "volume",
                         {"name": "blob", "type": "mono",
                          "phase_type": "hg"})
    xet.SubElement(vol, "string", {"name": "density_grid",
                                   "path": vol_path})
    xet.SubElement(vol, "rgb", {"name": "albedo", "value": "0.9"})
    xet.SubElement(vol, "rgb", {"name": "density_scaling", "value": "1.0"})
    xet.SubElement(vol, "rgb", {"name": "par", "value": "0.0"})
    trans = xet.SubElement(vol, "transform", {"name": "toWorld"})
    # scale index space (24^3) into a ~2.4-unit box centered in the room
    xet.SubElement(trans, "scale", {"x": "0.1", "y": "0.1", "z": "0.1"})
    xet.SubElement(trans, "translate", {"x": "1.5", "y": "1.5", "z": "1.5"})
    scene_file = str(tmp_path / "volscene.xml")
    # scene parser resolves meshes relative to the scene dir
    tree.write(scene_file)
    import shutil
    shutil.copytree(os.path.join(scene_dir, "..", "meshes"),
                    str(tmp_path / ".." / "meshes"), dirs_exist_ok=True)

    scene, cfg, _ = load_scene(str(tmp_path), "volscene.xml")
    assert cfg.volume_kind == 1
    cfg = dataclasses.replace(cfg, w=24, h=24, focal=cfg.focal * 24 / 512,
                              end_x=24, end_y=24, max_bounce=3)
    img = np.asarray(render_pass_vpt(scene, cfg, jax.random.PRNGKey(0),
                                     jnp.int32(1)))
    assert np.isfinite(img).all()
    assert img.max() > 0.01


def test_rotated_volume_tracking_oracle():
    """A ROTATED grid: rays sit inside the volume's world AABB but leave
    the local grid mid-interval. The r3 supervoxel DDA stalled there
    (clipped cell boundary behind the ray -> fp-nudge micro-hops until
    MAX_STEPS; 86% of tornado camera lanes never terminated) — axis-
    aligned fixtures cannot see it. Oracle: Campbell's theorem for the
    stochastic-NN field, E[Tr] = exp(-sigma * int prod_k r_k(x_k(t)) dt)
    with r_k the per-axis in-range probability of the jittered lookup,
    integrated numerically per ray."""
    theta = np.deg2rad(30.0)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    center = R @ np.full(3, RES / 2, np.float32)
    trans = -center                                   # world center = 0
    grid = jnp.full((3, RES, RES, RES), SIGMA, jnp.float32)
    maj = np.full(3, SIGMA * 1.05, np.float32)
    sv_size, sv = volume_ops._supervoxel_majorants(np.asarray(grid))
    vol = volume_ops.GridVolumeData(
        grid=grid, albedo=jnp.full(3, 0.9), inv_T=jnp.asarray(R.T),
        trans=jnp.asarray(trans),
        mini=jnp.full(3, -RES, jnp.float32),          # loose world AABB
        maxi=jnp.full(3, RES, jnp.float32),
        majorant=jnp.asarray(maj), pdf=jnp.asarray(maj / maj.sum()),
        ph_par=jnp.full(3, 0.5), ph_pdf=jnp.array([1.0, 0.0, 0.0]),
        sv_maj=jnp.asarray(sv), sv_size=sv_size)

    n = 32768
    rng = np.random.RandomState(7)
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = -2.0 * RES
    o[:, 1] = rng.uniform(-3, 3, n)
    o[:, 2] = rng.uniform(-3, 3, n)
    d = np.tile(np.float32([1, 0, 0]), (n, 1))
    max_t = jnp.full((n,), 4.0 * RES)

    # numerical Campbell oracle (vectorized trapezoid along each ray)
    lo = (o - trans) @ np.asarray(R.T).T
    ld = d @ np.asarray(R.T).T
    ts = np.linspace(0.0, 4.0 * RES, 2048, dtype=np.float64)
    pos = lo[:, None, :] + ts[None, :, None] * ld[:, None, :]
    r = np.clip(np.minimum(1.0, RES + 0.5 - pos)
                - np.maximum(0.0, 0.5 - pos), 0.0, 1.0)
    e_d = SIGMA * r.prod(-1)
    tau = np.trapezoid(e_d, ts, axis=1)
    expect_tr = np.exp(-tau).mean()

    tr = np.asarray(volume_ops.eval_tr_ratio_tracking(
        vol, 1, jax.random.PRNGKey(11), jnp.asarray(o), jnp.asarray(d),
        jnp.ones((n, 3)), max_t))
    got_tr = float(tr.mean())
    assert abs(got_tr - expect_tr) / expect_tr < 0.08, (got_tr, expect_tr)

    t, _beta = volume_ops.sample_distance_delta_tracking(
        vol, 1, jax.random.PRNGKey(12), jnp.asarray(o), jnp.asarray(d),
        jnp.ones((n, 3)), max_t)
    p_escape = float((np.asarray(t) < 0).mean())
    assert abs(p_escape - expect_tr) < 0.02, (p_escape, expect_tr)
