"""Wavefront length-compaction must be EXACT, not just unbiased.

trace_vpt's per-lane RNG is counter-based on (iteration, ORIGINAL lane
id), so sorting alive lanes to a dense prefix and narrowing the loop
width cannot change any lane's realized path. The compacted render must
therefore equal the uncompacted one lane-for-lane (same draws, same
per-lane arithmetic — only array layout differs). Tolerance is ULP-level
(1e-5): the narrowed widths and cond branches compile to different XLA
fusions whose reassociation differs by ~1e-6 (same allowance the golden
tests make for compiler noise); anything beyond that is misattribution —
the two bugs this test caught were 30.5 max pixel diff.

The schedule is passed EXPLICITLY as a static argument: the r5
A/B-aliasing bug (reading a module global inside a jitted body served
the first caller's schedule to every later call) means any test that
monkeypatches the global proves nothing.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.vpt import render_pass_vpt

from conftest import SCENE_DIR


def _render(scene, cfg, schedule, seed=5):
    return render_pass_vpt(scene, cfg, jax.random.PRNGKey(seed),
                           jnp.int32(1), schedule=schedule)


# nested schedules included: the first implementation was exact for any
# SINGLE stage but attributed colors to wrong lanes once stages nested
# (unstable lax.sort broke the ascending-pos prefix invariant)
@pytest.mark.parametrize("schedule", [((4, 4),),
                                      ((3, 2), (8, 8)),
                                      ((3, 2), (5, 4), (8, 16))])
def test_compaction_exact_vpt_cbox(schedule):
    scene, cfg, _ = load_scene(SCENE_DIR + "/vpt/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=6)
    base = np.asarray(_render(scene, cfg, ()))
    comp = np.asarray(_render(scene, cfg, schedule))
    np.testing.assert_allclose(comp, base, rtol=1e-5, atol=1e-5)


def test_compaction_exact_no_rr_golden_config():
    """The exact config that exposed the nested-stage bug: no RR, small
    max_bounce (lanes die via the bounce cap), null-budget iterations."""
    scene, cfg, _ = load_scene(SCENE_DIR + "/vpt/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=48, h=48, focal=cfg.focal * 48 / 512,
                              end_x=48, end_y=48, max_bounce=3,
                              anti_alias=False, stratified_sampling=False,
                              use_rr=False)
    base = np.asarray(_render(scene, cfg, (), seed=42))
    comp = np.asarray(_render(scene, cfg,
                              ((5, 2), (9, 4), (13, 8), (17, 32)),
                              seed=42))
    np.testing.assert_allclose(comp, base, rtol=1e-5, atol=1e-5)


def test_compaction_overflow_branch_correct():
    """A div so large that alive lanes cannot fit (every lane alive at
    the split) must take the sound full-width branch and still match."""
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=16, h=16, focal=cfg.focal * 16 / 512,
                              end_x=16, end_y=16, max_bounce=5,
                              use_rr=False)
    # cbox is enclosed: without RR every lane stays alive -> overflow
    base = np.asarray(_render(scene, cfg, ()))
    comp = np.asarray(_render(scene, cfg, ((2, 64),)))
    np.testing.assert_allclose(comp, base, rtol=1e-5, atol=1e-5)
