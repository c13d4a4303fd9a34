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
