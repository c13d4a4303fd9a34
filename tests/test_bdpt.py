"""BDPT validation against the (oracle-validated) unidirectional PT.

1. s<=1 strategies without MIS reduce exactly to PT's NEE estimator
   (deterministic match under a delta light, no media).
2. The full MIS-weighted estimator converges to the same image as PT.
3. Transient mode: time bins are consistent with steady state and with
   geometric time-of-flight bounds.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.bdpt import render_pass_bdpt
from adapt_tpu.renderer.pt import render_pass_pt

from conftest import SCENE_DIR

NOMEDIA = dict(world_scattering=False, medium_kinds=(), has_null_bsdf=False)


@pytest.fixture(scope="module")
def cbox():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=32, h=32, focal=cfg.focal * 32 / 512, end_x=32, end_y=32,
        use_rr=False, anti_alias=False, stratified_sampling=False, **NOMEDIA)
    return scene, cfg


def test_bdpt_s1_equals_pt_direct(cbox):
    scene, cfg = cbox
    base = dataclasses.replace(cfg, max_bounce=1)
    cfg_b = dataclasses.replace(base, use_mis=False, start_t=2, end_t=3,
                                start_s=1, end_s=2)
    key = jax.random.PRNGKey(0)
    b = np.asarray(render_pass_bdpt(scene, cfg_b, key, jnp.int32(1))[0])
    p = np.asarray(render_pass_pt(scene, base, key, jnp.int32(1)))
    assert np.abs(b - p).max() < 1e-3


def test_bdpt_mis_converges_to_pt(cbox):
    scene, cfg = cbox
    base = dataclasses.replace(cfg, max_bounce=3, anti_alias=True)
    key = jax.random.PRNGKey(1)
    ab = np.zeros((32 * 32, 3), np.float32)
    ap = np.zeros((32 * 32, 3), np.float32)
    spp = 48
    for i in range(spp):
        key, k1, k2 = jax.random.split(key, 3)
        ab += np.nan_to_num(np.asarray(
            render_pass_bdpt(scene, base, k1, jnp.int32(i + 1))[0]))
        ap += np.nan_to_num(np.asarray(
            render_pass_pt(scene, base, k2, jnp.int32(i + 1))))
    ratio = ab.mean(0) / ap.mean(0)
    assert np.abs(ratio - 1.0).max() < 0.06, ratio


def test_bdpt_transient_bins(cbox):
    scene, cfg = cbox
    cfg_t = dataclasses.replace(cfg, max_bounce=2,
                                decomposition="transient_cam", t_bins=64,
                                t_min=0.0, t_interval=0.5)
    assert cfg_t.transient
    key = jax.random.PRNGKey(2)
    color, bins, cnts = render_pass_bdpt(scene, cfg_t, key, jnp.int32(1))
    color, bins = np.asarray(color), np.asarray(bins)
    cnts = np.asarray(cnts)
    assert np.isfinite(bins).all()
    # every binned contribution is part of the steady-state color
    assert bins.sum() <= color.sum() * 1.001 + 1e-3
    assert bins.sum() > 0.1 * color.sum()
    # geometric lower bound on path time: the camera is ~8 units outside
    # the box, so nothing can arrive before ~8 units of flight time
    first_bin = np.nonzero(bins.sum(axis=(0, 2)))[0]
    assert first_bin.size > 0
    assert first_bin[0] * cfg_t.t_interval >= 8.0, first_bin[0]


def test_bdpt_converges_to_pt_glass_scene():
    """Cross-estimator agreement on a specular-heavy scene: BDPT == PT on
    csphere/balls-multi-showcase.xml (det-refraction glass ball, mirror,
    fresnel-blend, mod-phong, TWO area emitters). Guards refraction
    transport (ior^2 radiance asymmetry, bsdf pdfs in MIS) that the cbox
    tests never exercise; the same agreement was measured at 1-2% per
    region on the real chip at 512^2 x 4096 spp (see PARITY.md)."""
    from adapt_tpu.renderer.bdpt import render_batch_bdpt
    from adapt_tpu.renderer.pt import render_batch_pt
    scene, cfg, _ = load_scene(SCENE_DIR + "/csphere/",
                               "balls-multi-showcase.xml")
    cfg = dataclasses.replace(
        cfg, w=24, h=24, focal=cfg.focal * 24 / 512, end_x=24, end_y=24,
        max_bounce=4, use_rr=False, anti_alias=False,
        stratified_sampling=False, **NOMEDIA)
    spp = 256
    b = np.asarray(render_batch_bdpt(scene, cfg, jax.random.PRNGKey(3),
                                     jnp.int32(1), spp)) / spp
    p = np.asarray(render_batch_pt(scene, cfg, jax.random.PRNGKey(9),
                                   jnp.int32(1), spp)) / spp
    # scene-wide energy (unclipped linear; emitter pixels included)
    ratio = b.mean() / p.mean()
    assert abs(ratio - 1.0) < 0.06, ratio
    # per-pixel agreement on well-lit diffuse pixels (clip tails: t=1
    # splats make single-pixel BDPT variance heavy)
    lit = (p.mean(-1) > 0.05) & (p.mean(-1) < 1.0)
    assert lit.sum() > 100
    rel = np.abs(b.mean(-1)[lit] - p.mean(-1)[lit]) / p.mean(-1)[lit]
    assert np.median(rel) < 0.15, np.median(rel)


def test_bdpt_modulated_tof(cbox):
    """cfg.modulated applies the AMCW sine-squared modulation (reference
    bdpt.py:407-408): every contribution scales by a factor in [0,1] of
    its path time, so the image is elementwise <= the unmodulated one and
    strictly darker overall."""
    scene, cfg = cbox
    key = jax.random.PRNGKey(5)
    base = np.asarray(render_pass_bdpt(scene, cfg, key, jnp.int32(1))[0])
    mod = np.asarray(render_pass_bdpt(
        scene, dataclasses.replace(cfg, modulated=True), key,
        jnp.int32(1))[0])
    assert (mod <= base + 1e-6).all()
    assert mod.sum() < 0.99 * base.sum()


def test_bdpt_deep_bounce_compiles():
    """max_bounce >= 20 must compile and run (VERDICT r1 #4: the old
    unrolled strategy loop never finished compiling; CAP is now 32 and the
    per-case lax.scan strategy loop is O(1) in depth)."""
    import dataclasses
    from adapt_tpu.renderer.bdpt import render_pass_bdpt, CAP
    assert CAP >= 32
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=8, h=8, focal=cfg.focal * 8 / 512,
                              end_x=8, end_y=8, max_bounce=20,
                              anti_alias=False, stratified_sampling=False,
                              use_rr=False)
    out, _b, _c = render_pass_bdpt(scene, cfg, jax.random.PRNGKey(0),
                                   jnp.int32(1))
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.max() > 0.01


def test_bdpt_crop_deep_cap():
    """Crop windows raise the depth cap to CAP_CROP=400 (reference
    T_MAX_BOUNCE): max_bounce=40 on a cropped film must run un-clamped
    (no clamp warning), while full-frame clamps at CAP=32 with a
    warning."""
    import dataclasses
    import warnings as w
    from adapt_tpu.renderer.bdpt import render_pass_bdpt, CAP, CAP_CROP
    assert CAP_CROP >= 400
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=16, h=16, focal=cfg.focal * 16 / 512,
                              start_x=4, end_x=10, start_y=4, end_y=10,
                              max_bounce=40, anti_alias=False,
                              stratified_sampling=False, use_rr=False)
    with w.catch_warnings():
        w.simplefilter("error")           # a clamp warning would raise
        out, _b, _c = render_pass_bdpt(scene, cfg, jax.random.PRNGKey(0),
                                       jnp.int32(1))
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.max() > 0.001
    # full frame still clamps (loudly) at CAP
    cfg_full = dataclasses.replace(cfg, start_x=0, end_x=16, start_y=0,
                                   end_y=16)
    with pytest.warns(UserWarning, match="clamped"):
        out, _b, _c = render_pass_bdpt(scene, cfg_full,
                                       jax.random.PRNGKey(0), jnp.int32(1))
    assert np.isfinite(np.asarray(out)).all()


def test_transient_checkpoint_roundtrip():
    """Transient checkpoints carry the time histograms; a resumed run's
    export equals the uninterrupted run's, and loading a steady-state
    checkpoint into a transient run raises."""
    from adapt_tpu.renderer.bdpt import BDPT
    scene, cfg, _ = load_scene(SCENE_DIR + "/trans/", "cbox-point.xml")
    cfg = dataclasses.replace(cfg, w=16, h=16, focal=cfg.focal * 16 / 512,
                              end_x=16, end_y=16, max_bounce=3,
                              anti_alias=False, stratified_sampling=False,
                              use_rr=False)
    r = BDPT(scene, cfg, seed=3)
    r.render()
    chk = r.get_check_point()
    assert "time_bins" in chk
    r2 = BDPT(scene, cfg, seed=99)
    r2.load_check_point(chk)
    np.testing.assert_array_equal(np.asarray(r2.time_cnts),
                                  np.asarray(r.time_cnts))
    r.render()
    r2.render()
    np.testing.assert_allclose(np.asarray(r2.time_bins),
                               np.asarray(r.time_bins), rtol=1e-6)
    bad = dict(chk)
    del bad["time_bins"]
    with pytest.raises(ValueError, match="transient"):
        BDPT(scene, cfg).load_check_point(bad)

    # different time axis must not merge
    with pytest.raises(ValueError, match="t_interval"):
        BDPT(scene, dataclasses.replace(
            cfg, t_interval=cfg.t_interval * 0.5)).load_check_point(chk)

    # a steady-state run must refuse a transient checkpoint (the
    # histograms would be dropped silently) — and a rejected load leaves
    # the renderer untouched (validation precedes mutation)
    steady = BDPT(scene, dataclasses.replace(cfg, decomposition="none",
                                             t_bins=0), seed=1)
    with pytest.raises(ValueError, match="steady"):
        steady.load_check_point(chk)
    assert steady.cnt == 0 and float(np.asarray(steady.color).max()) == 0.0


def test_foam_crop_transient_e2e():
    """The reference's canonical transient benchmark (trans/foam.xml,
    auto_test.sh): collimated laser through a scattering slab, BDPT,
    center crop. Validates the crop-restricted transient path (only crop
    pixels traced; bins crop-local) and the tdom analysis on its output."""
    import dataclasses
    import os
    from adapt_tpu.renderer.bdpt import BDPT
    from adapt_tpu.utils.tdom_analyze import time_domain_curve, \
        analyze_peaks
    mesh = os.path.join(SCENE_DIR, "meshes", "foam", "foam4.obj")
    if not os.path.exists(mesh):
        pytest.skip("foam stand-in not generated "
                    "(scripts/gen_procedural.py)")
    scene, cfg, _ = load_scene(SCENE_DIR + "/trans/", "foam.xml")
    assert cfg.transient and cfg.t_bins == 500
    # shrink film + tighten the time gate around the direct arrival
    # (laser z=+0.02 -> slab -> camera z=-0.02: first light at ~0.0405)
    cfg = dataclasses.replace(
        cfg, w=64, h=64, focal=cfg.focal * 64 / 512,
        start_x=28, end_x=36, start_y=28, end_y=36,
        max_bounce=8, t_bins=80, t_min=0.035, t_interval=0.00075)
    r = BDPT(scene, cfg, seed=0)
    assert r.time_bins.shape[0] == 64          # crop-local (8x8)
    for _ in range(24):
        r.render()
    bins = np.asarray(r.time_bins)
    assert np.isfinite(bins).all()
    curve = time_domain_curve(r.transient_frames(), window_mode="whole")
    assert curve.sum() > 0.0, "no transient signal"
    first = int(np.argmax(curve > 0))
    t_first = cfg.t_min + first * cfg.t_interval
    assert 0.039 < t_first < 0.055, t_first
    peaks = analyze_peaks(curve, interval=cfg.t_interval)
    assert peaks is None or len(peaks) >= 0    # runs without raising


def test_walk_places_full_depth_without_null_budget():
    """With no null BSDF, every active walk iteration places a vertex
    (medium interactions place VERTEX_MEDIUM), so the walk must fill all
    max_bnc slots in exactly max_bnc iterations — the budget that used
    to be padded by NULL_BUDGET under media_everywhere. Uses the real
    cbox (scattering world HG medium, no null surfaces)."""
    from adapt_tpu.renderer.bdpt import generate_eye_path
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(
        cfg, w=16, h=16, focal=cfg.focal * 16 / 512, end_x=16, end_y=16,
        use_rr=False, anti_alias=False, stratified_sampling=False,
        max_bounce=4)
    assert cfg.world_scattering and not cfg.has_null_bsdf
    buf, vnum = jax.jit(
        lambda k: generate_eye_path(scene, cfg, k, jnp.int32(1), 4)
    )(jax.random.PRNGKey(3))
    vnum = np.asarray(vnum)
    # camera vertex + 4 walk vertices for lanes that survived every bounce
    assert vnum.max() == 5, vnum.max()
    # and the deepest slot is genuinely populated for those lanes
    vt = np.asarray(buf["vtype"])[4]
    assert (vt[vnum == 5] >= 0).all()


def test_scan_mode_matches_flat_mode(cbox, monkeypatch):
    """The per-strategy lax.scan path (deep transient crops exceed the
    flat-chunk cap) must agree with the flat-batch path: same strategies,
    same RNG streams, same MIS — scan mode is the only consumer of the
    traced-index row reads in _mis_weight, which no toy-size test hits
    otherwise (Q = FLAT_LANES/N makes small frames always flat)."""
    from adapt_tpu.renderer import bdpt as bdpt_mod
    scene, cfg = cbox
    cfg = dataclasses.replace(cfg, max_bounce=3)
    key = jax.random.PRNGKey(5)

    cl, cs, _b, _c = bdpt_mod.bdpt_pass_core(scene, cfg, key, jnp.int32(1))
    flat = np.asarray(cl) + np.asarray(cs)

    monkeypatch.setattr(bdpt_mod, "FLAT_MAX_CHUNKS", 0)
    cl2, cs2, _b2, _c2 = bdpt_mod.bdpt_pass_core(scene, cfg, key,
                                                 jnp.int32(1))
    scan = np.asarray(cl2) + np.asarray(cs2)
    np.testing.assert_allclose(scan, flat, rtol=2e-4, atol=1e-5)


def test_true_unwarped_transient_shift(cbox):
    """cfg.unwarp (TRUE camera-unwarped binning — the reference declares
    transient_lit but coerces it to warped) must shift each pixel's
    time-domain mass earlier by exactly its camera first-leg time: the
    per-pixel center-of-mass difference vs the warped run equals the
    primary-hit depth (no media, ior 1) within a bin width."""
    from adapt_tpu.ops.intersect import ray_intersect
    from adapt_tpu.renderer.base import camera_rays
    scene, cfg = cbox
    cfg_t = dataclasses.replace(cfg, max_bounce=2,
                                decomposition="transient_cam", t_bins=96,
                                t_min=0.0, t_interval=0.25)
    key = jax.random.PRNGKey(9)
    _c, bins_w, _n = render_pass_bdpt(scene, cfg_t, key, jnp.int32(1))
    cfg_u = dataclasses.replace(cfg_t, unwarp=True)
    _c, bins_u, _n = render_pass_bdpt(scene, cfg_u, key, jnp.int32(1))
    bins_w = np.asarray(bins_w).sum(-1)            # (N, T) energy
    bins_u = np.asarray(bins_u).sum(-1)

    t_axis = (np.arange(cfg_t.t_bins) + 0.5) * cfg_t.t_interval
    ro, rd = camera_rays(scene, cfg_t, jax.random.PRNGKey(0), jnp.int32(1))
    depth = np.asarray(ray_intersect(scene, cfg_t, ro, rd).t)

    # pixels with solid mass in both runs, away from the range edges
    ew, eu = bins_w.sum(1), bins_u.sum(1)
    ok = (ew > 1e-4) & (eu > 1e-4) \
        & (bins_w[:, -4:].sum(1) < 0.05 * ew) \
        & (bins_u[:, :2].sum(1) < 0.05 * eu)
    assert ok.sum() > 200
    com_w = (bins_w[ok] * t_axis).sum(1) / ew[ok]
    com_u = (bins_u[ok] * t_axis).sum(1) / eu[ok]
    shift = com_w - com_u
    err = np.abs(shift - depth[ok])
    # median-robust: AA jitter off in the fixture, same RNG stream, so
    # the only slack is binning quantization
    assert np.median(err) < 2 * cfg_t.t_interval, np.median(err)
    assert np.mean(err < 3 * cfg_t.t_interval) > 0.9
