"""Emitter NEE (sample_hit) analytic oracles for the delta-type sources.

Reference semantics (emitters/abtract_source.py:90-159): point = intensity
* min(1/d^2, 1); spot = intensity / d^2 inside the half-angle cone, else 0;
collimated = deterministic back-projection onto the beam axis with pdf 0
(a reference quirk kept for parity), zero outside the beam radius.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from adapt_tpu.constants import EmitterTag
from adapt_tpu.ops import emitter_ops
from adapt_tpu.scene.compile import RenderConfig


@dataclasses.dataclass
class FakeScene:
    emit_kind: jnp.ndarray
    emit_pos: jnp.ndarray
    emit_dir: jnp.ndarray
    emit_intensity: jnp.ndarray
    emit_r: jnp.ndarray
    emit_inv_area: jnp.ndarray
    emit_bits: jnp.ndarray
    emit_obj: jnp.ndarray
    emit_time: jnp.ndarray


def _scene(kind, r):
    z = jnp.zeros((1, 3), jnp.float32)
    return FakeScene(
        emit_kind=jnp.asarray([kind], jnp.int32),
        emit_pos=z,
        emit_dir=jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        emit_intensity=jnp.asarray([[8.0, 8.0, 8.0]], jnp.float32),
        emit_r=jnp.asarray([r], jnp.float32),
        emit_inv_area=jnp.ones((1,), jnp.float32),
        emit_bits=jnp.zeros((1,), jnp.int32),
        emit_obj=jnp.full((1,), -1, jnp.int32),
        emit_time=jnp.zeros((1,), jnp.float32))


def _cfg(kind):
    return RenderConfig(w=4, h=4, focal=1.0, emitter_kinds=(int(kind),),
                        n_emitters=1)


def _sample(scene, cfg, pts):
    eid = jnp.zeros((pts.shape[0],), jnp.int32)
    u = jnp.full((pts.shape[0], 3), 0.5, jnp.float32)
    pos, inten, pdf, n = emitter_ops.sample_hit(scene, cfg, eid,
                                                jnp.asarray(pts), u)
    return np.asarray(pos), np.asarray(inten), np.asarray(pdf)


def test_point_inverse_square_capped():
    scene = _scene(EmitterTag.POINT, 0.0)
    cfg = _cfg(EmitterTag.POINT)
    pts = np.array([[0, 0, 2.0], [0, 0, 0.5]], np.float32)
    _pos, inten, _pdf = _sample(scene, cfg, pts)
    np.testing.assert_allclose(inten[0], 8.0 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(inten[1], 8.0, rtol=1e-6)   # capped at 1


def test_spot_cone():
    half_cos = np.cos(np.deg2rad(30.0))
    scene = _scene(EmitterTag.SPOT, float(half_cos))
    cfg = _cfg(EmitterTag.SPOT)
    pts = np.array([[0, 0, 2.0],          # on-axis, d=2
                    [2.0, 0, 2.0],        # 45 deg off-axis: outside
                    [0.2, 0, 2.0]],       # ~5.7 deg: inside
                   np.float32)
    _pos, inten, _pdf = _sample(scene, cfg, pts)
    np.testing.assert_allclose(inten[0], 8.0 / 4.0, rtol=1e-6)
    assert (inten[1] == 0).all()
    d2 = 0.2 ** 2 + 2.0 ** 2
    np.testing.assert_allclose(inten[2], 8.0 / d2, rtol=1e-5)


def test_collimated_beam():
    scene = _scene(EmitterTag.COLLIMATED, 0.5)   # beam radius 0.5
    cfg = _cfg(EmitterTag.COLLIMATED)
    pts = np.array([[0.2, 0, 3.0],        # inside beam
                    [1.0, 0, 3.0],        # outside radius
                    [0.0, 0, -1.0]],      # behind the source
                   np.float32)
    pos, inten, pdf = _sample(scene, cfg, pts)
    assert (inten[0] > 0).all()
    # back-projection onto the beam axis (ret_pos = hit - proj*dir)
    np.testing.assert_allclose(pos[0], [0.2, 0, 0], atol=1e-6)
    assert (pdf == 0).all()               # reference quirk: pdf stays 0
    assert (inten[1] == 0).all()
    # reference quirk kept (abtract_source.py:148-155): points BEHIND the
    # beam origin keep FULL intensity toward ret_pos = emitter pos (the
    # r>0 branch only zeroes on dist >= r) — invisible in shipped scenes
    # because the laser sits on a wall
    assert (inten[2] == inten[0]).all()
    np.testing.assert_allclose(pos[2], [0.0, 0, 0], atol=1e-6)


def test_zero_emitter_scene_sampling():
    """Emitter-less scenes are legal (skybox/ambient only): the light pick
    returns valid=False instead of dividing by zero."""
    import dataclasses
    from adapt_tpu.ops.emitter_ops import sample_light_index
    cfg = dataclasses.replace(_cfg(EmitterTag.POINT), n_emitters=0)
    u = jnp.asarray(np.linspace(0, 0.99, 8, dtype=np.float32))
    idx, pdf, valid = sample_light_index(cfg, u, jnp.full((8,), -1,
                                                          jnp.int32))
    assert not np.asarray(valid).any()
    assert np.isfinite(np.asarray(pdf)).all()
