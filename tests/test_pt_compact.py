"""PT length-compaction exactness (same contract as test_vpt_compact)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.pt import render_pass_pt

from conftest import SCENE_DIR


@pytest.mark.parametrize("schedule", [((3, 2),),
                                      ((2, 2), (5, 4), (7, 16))])
def test_compaction_exact_pt_cbox(schedule):
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=8,
                              rr_bounce_th=1, rr_threshold=0.6)
    base = np.asarray(render_pass_pt(scene, cfg, jax.random.PRNGKey(3),
                                     jnp.int32(1), schedule=()))
    comp = np.asarray(render_pass_pt(scene, cfg, jax.random.PRNGKey(3),
                                     jnp.int32(1), schedule=schedule))
    np.testing.assert_allclose(comp, base, rtol=1e-5, atol=1e-5)


def test_compaction_overflow_branch_pt():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=16, h=16, focal=cfg.focal * 16 / 512,
                              end_x=16, end_y=16, max_bounce=5,
                              use_rr=False)
    base = np.asarray(render_pass_pt(scene, cfg, jax.random.PRNGKey(3),
                                     jnp.int32(1), schedule=()))
    comp = np.asarray(render_pass_pt(scene, cfg, jax.random.PRNGKey(3),
                                     jnp.int32(1), schedule=((2, 32),)))
    np.testing.assert_allclose(comp, base, rtol=1e-5, atol=1e-5)


def test_derive_schedule_measured_profiles():
    """The derivation must reproduce the shape of the hand-tuned
    schedules on the chip-measured alive profiles (ledger numbers in
    renderer/pt.py and /tmp logs recorded 2026-08-20)."""
    from adapt_tpu.renderer.compact import derive_schedule
    knot = [0.929, 0.708, 0.582, 0.488, 0.314, 0.234,
            0.169, 0.122, 0.086, 0.029, 0.008, 0.006]
    orb = [0.971, 0.173, 0.095, 0.038, 0.018, 0.007, 0.005, 0.002,
           0.001] + [0.001] * 15
    assert derive_schedule(knot, 12) == ((5, 2), (7, 4), (9, 8), (10, 16))
    assert derive_schedule(orb, 24) == ((2, 4), (4, 16), (5, 32), (6, 64))
    # flat/short profiles derive nothing
    assert derive_schedule([0.9] * 8, 8) == ()
    assert derive_schedule([0.2, 0.1], 2) == ()
    # expected occupancy of every narrowed prefix stays under margin
    for prof, iters in ((knot, 12), (orb, 24)):
        for at, div in derive_schedule(prof, iters):
            assert prof[at - 1] * div <= 0.7


def test_probe_alive_matches_plain_pass():
    """probe_alive_pt returns the plain pass's radiance plus a sane
    monotone alive profile."""
    from adapt_tpu.renderer.pt import probe_alive_pt
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=6)
    base = np.asarray(render_pass_pt(scene, cfg, jax.random.PRNGKey(5),
                                     jnp.int32(1), schedule=()))
    rad, counts = probe_alive_pt(scene, cfg, jax.random.PRNGKey(5),
                                 jnp.int32(1))
    # static-unrolled stats loop vs fori: ULP-level fusion reassociation
    np.testing.assert_allclose(np.asarray(rad), base, rtol=1e-5,
                               atol=1e-5)
    counts = np.asarray(counts)
    assert counts.shape == (6,)
    assert (counts[1:] <= counts[:-1]).all()
    assert 0 < counts[0] <= 32 * 32


def test_auto_compaction_renderer_exact():
    """A Renderer over the auto-compaction prim threshold produces the
    same accumulated image as one with auto off (per-lane counter RNG
    makes compaction realization-preserving), and actually derives a
    schedule from its probe."""
    from adapt_tpu.renderer import pt as PT
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=8,
                              rr_bounce_th=1, rr_threshold=0.6)
    old = PT._AUTO_MIN_PRIMS
    try:
        PT._AUTO_MIN_PRIMS = 1          # force auto on the tiny scene
        auto = PT.Renderer(scene, cfg, seed=2)
        assert auto._auto
        for _ in range(3):
            auto.render()
        assert auto._sched is not None
        PT._AUTO_MIN_PRIMS = 10 ** 9    # plain renderer: auto off
        plain = PT.Renderer(scene, cfg, seed=2)
        assert not plain._auto
        for _ in range(auto.cnt):
            plain.render()
        np.testing.assert_allclose(np.asarray(auto.color),
                                   np.asarray(plain.color),
                                   rtol=1e-5, atol=1e-5)
    finally:
        PT._AUTO_MIN_PRIMS = old
