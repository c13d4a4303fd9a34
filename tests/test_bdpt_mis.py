"""Deterministic BDPT MIS invariant (VERDICT r1 #6).

For a FIXED geometric path on a non-delta scene, the MIS weights of all
(s,t) strategies of that path length must sum to 1 — the standard BDPT
unit check (PBRT 16.3; reference renderer/bdpt.py:430-491). The vertex
buffers are built by hand with the renderer's own pdf bookkeeping
(pdf_vertex / _convert_density / _get_pdf_bwd / _pdf_light — exactly what
bdpt_random_walk stores), so the test fails if any ratio-sweep term or
stored-pdf convention is perturbed.

The pdf_camera≡0 reference quirk is consistency-preserving: every sweep
computes the camera-adjacent transition with the same remapped value, so
the weights still telescope to a partition of unity (verified here).
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.ops.intersect import ray_intersect
from adapt_tpu.ops.math3d import normalize, dot
from adapt_tpu.ops import emitter_ops
from adapt_tpu.constants import (VERTEX_CAMERA, VERTEX_SURFACE,
                                 VERTEX_EMITTER, EmitterTag)
from adapt_tpu.renderer import bdpt as B

from conftest import SCENE_DIR


def _set_vertex(buf, k, **vals):
    for name, v in vals.items():
        arr = buf[name]
        v = jnp.asarray(v)
        if arr.ndim == 2:
            buf[name] = arr.at[k, 0].set(v)
        else:
            buf[name] = arr.at[:, k, 0].set(v)
    return buf


def _hit(scene, cfg, o, d):
    it = ray_intersect(scene, cfg, o[None, :], d[None, :])
    if not bool(np.asarray(it.is_hit)[0]):
        return None
    pos = o + d * it.t[0]
    return (pos, it.n_s[0], it.obj_id[0])


def _build_path(scene, cfg):
    """camera -> x1 (wall) -> x2 (wall/floor) -> x3 (on the area light)."""
    kinds = np.asarray(scene.emit_kind)
    assert (kinds == EmitterTag.AREA).any(), "scene needs an area emitter"
    eid = int(np.argmax(kinds == EmitterTag.AREA))
    light_obj = scene.emit_obj[eid]
    assert int(light_obj) >= 0, "area emitter must be attached"

    x0 = scene.cam_t
    d0 = B._cam_normal(scene)
    first = _hit(scene, cfg, x0, normalize(d0 + jnp.array(
        [0.1, -0.3, 0.0], jnp.float32)))
    assert first is not None
    x1, n1, o1 = first
    assert not bool(scene.mat_is_delta[o1]), "x1 must be non-delta"
    d01 = normalize(x1 - x0)
    # mirror-reflect then tilt: stays in x1's outgoing hemisphere; search a
    # few tilts until the bounce lands on a non-delta, non-emitter surface
    refl = d01 - 2.0 * dot(d01, n1) * n1
    tangent = normalize(jnp.cross(n1, jnp.array([0.3, 0.8, 0.52])))
    bitangent = normalize(jnp.cross(n1, tangent))
    second = None
    for a, b in [(0.4, 0.0), (-0.4, 0.0), (0.0, 0.4), (0.0, -0.4),
                 (0.2, 0.2), (-0.2, -0.2), (0.0, 0.0)]:
        d1 = normalize(refl + a * tangent + b * bitangent)
        if float(dot(d1, n1)) < 0.05:
            continue
        cand = _hit(scene, cfg, x1 + 1e-3 * d1, d1)
        if cand is None:
            continue
        _x2, _n2, _o2 = cand
        if bool(scene.mat_is_delta[_o2]):
            continue
        if int(scene.obj_emitter[_o2]) >= 0:
            continue
        second = cand
        break
    assert second is not None, "no valid x2 found"
    x2, n2, o2 = second

    u = jnp.array([[0.3, 0.7, 0.1]], jnp.float32)
    eidv = jnp.full((1,), eid, jnp.int32)
    emit_pos, _inten, _pdf, e_normal = emitter_ops.sample_hit(
        scene, cfg, eidv, x2[None, :], u)
    x3, n3 = emit_pos[0], e_normal[0]
    # the light must face x2, or the path has zero light-side pdf
    assert float(dot(normalize(x2 - x3), n3)) > 0.05
    return (x0, (x1, n1, o1), (x2, n2, o2), (x3, n3, light_obj), eid)


def _make_buffers(scene, cfg, path):
    """Fill cam/lit vertex buffers for the full path with the walk's exact
    pdf bookkeeping (bdpt_random_walk; reference bdpt.py:204-304)."""
    x0, (x1, n1, o1), (x2, n2, o2), (x3, n3, light_obj), eid = path
    D = 5
    cam = B._vertex_buffers(1, D, False)
    lit = B._vertex_buffers(1, D, False)
    fspace = B.B_IN_FSPACE

    def vdict(buf, k):
        return B._static_vertex(buf, k)

    def pdf_v(buf, k, ray_in, out_dir):
        return B.pdf_vertex(scene, cfg, vdict(buf, k), ray_in[None, :],
                            out_dir[None, :])[0]

    # --- camera subpath (TRANSPORT_RAD) ---
    cam = _set_vertex(cam, 0, vtype=VERTEX_CAMERA, obj_id=-1, emit_id=-1,
                      bits=B.B_POS_DELTA | fspace, pos=x0,
                      beta=jnp.ones(3))
    d01 = normalize(x1 - x0)
    # pdf_camera quirk: the walk starts with directional pdf 0
    c1 = B._convert_density(jnp.zeros((1,)), (x1 - x0)[None, :],
                            n1[None, :], jnp.zeros((1,), bool))[0]
    cam = _set_vertex(cam, 1, vtype=VERTEX_SURFACE, obj_id=o1, emit_id=-1,
                      bits=fspace, pos=x1, n_s=n1, n_g=n1, ray_in=d01,
                      pdf_fwd=c1, beta=jnp.ones(3))
    d12 = normalize(x2 - x1)
    sa12 = pdf_v(cam, 1, d01, d12)
    c2 = B._convert_density(sa12[None], (x2 - x1)[None, :], n2[None, :],
                            jnp.zeros((1,), bool))[0]
    # bwd pdf written onto v0 when the walk samples v1 -> v2
    bwd0 = B._get_pdf_bwd(x0[None, :], jnp.zeros((1, 3)),
                          jnp.zeros((1,), bool),
                          pdf_v(cam, 1, -d12, -d01)[None], x1[None, :])[0]
    cam["pdf_bwd"] = cam["pdf_bwd"].at[0, 0].set(bwd0)
    cam = _set_vertex(cam, 2, vtype=VERTEX_SURFACE, obj_id=o2, emit_id=-1,
                      bits=fspace, pos=x2, n_s=n2, n_g=n2, ray_in=d12,
                      pdf_fwd=c2, beta=jnp.ones(3))
    d23 = normalize(x3 - x2)
    sa23 = pdf_v(cam, 2, d12, d23)
    c3 = B._convert_density(sa23[None], (x3 - x2)[None, :], n3[None, :],
                            jnp.zeros((1,), bool))[0]
    bwd1 = B._get_pdf_bwd(x1[None, :], n1[None, :], jnp.ones((1,), bool),
                          pdf_v(cam, 2, -d23, -d12)[None], x2[None, :])[0]
    cam["pdf_bwd"] = cam["pdf_bwd"].at[1, 0].set(bwd1)
    cam = _set_vertex(cam, 3, vtype=VERTEX_SURFACE, obj_id=light_obj,
                      emit_id=eid, bits=B.B_IS_AREA | fspace, pos=x3,
                      n_s=n3, n_g=n3, ray_in=d23, pdf_fwd=c3,
                      beta=jnp.ones(3))

    # --- light subpath (TRANSPORT_IMP) ---
    inv_area = scene.emit_inv_area[eid]
    n_l = float(max(cfg.n_emitters, 1))
    lit = _set_vertex(lit, 0, vtype=VERTEX_EMITTER, obj_id=light_obj,
                      emit_id=eid, bits=scene.emit_bits[eid], pos=x3,
                      n_s=n3, n_g=n3, pdf_fwd=inv_area / n_l,
                      time=scene.emit_time[eid], beta=jnp.ones(3))
    d32 = normalize(x2 - x3)
    # area-light sample_le direction pdf: cosine hemisphere
    pdf_dir_le = jnp.maximum(dot(d32[None, :], n3[None, :]), 0.0)[0] / np.pi
    l1 = B._convert_density(pdf_dir_le[None], (x2 - x3)[None, :],
                            n2[None, :], jnp.zeros((1,), bool))[0]
    lit = _set_vertex(lit, 1, vtype=VERTEX_SURFACE, obj_id=o2, emit_id=-1,
                      bits=fspace, pos=x2, n_s=n2, n_g=n2, ray_in=d32,
                      pdf_fwd=l1, beta=jnp.ones(3))
    d21 = normalize(x1 - x2)
    sa21 = pdf_v(lit, 1, d32, d21)
    l2 = B._convert_density(sa21[None], (x1 - x2)[None, :], n1[None, :],
                            jnp.zeros((1,), bool))[0]
    bwdL0 = B._get_pdf_bwd(x3[None, :], n3[None, :], jnp.ones((1,), bool),
                           pdf_v(lit, 1, -d21, -d32)[None], x2[None, :])[0]
    lit["pdf_bwd"] = lit["pdf_bwd"].at[0, 0].set(bwdL0)
    lit = _set_vertex(lit, 2, vtype=VERTEX_SURFACE, obj_id=o1, emit_id=-1,
                      bits=fspace, pos=x1, n_s=n1, n_g=n1, ray_in=d21,
                      pdf_fwd=l2, beta=jnp.ones(3))
    d10 = normalize(x0 - x1)
    bwdL1 = B._get_pdf_bwd(x2[None, :], n2[None, :], jnp.ones((1,), bool),
                           pdf_v(lit, 2, -d10, -d21)[None], x1[None, :])[0]
    lit["pdf_bwd"] = lit["pdf_bwd"].at[1, 0].set(bwdL1)
    return cam, lit


def _strategy_weights(scene, cfg, cam, lit, path, n_verts):
    """MIS weight of every (s,t) split with s+t == n_verts."""
    x0 = path[0]
    x3, n3, light_obj = path[3]
    eid = path[4]
    weights = {}
    for t in range(1, n_verts + 1):
        s = n_verts - t
        if t == 1:
            cam_side = B._null_vertex(1, False)
            cam_side["vtype"] = jnp.full((1,), VERTEX_CAMERA, jnp.int32)
            cam_side["bits"] = jnp.full(
                (1,), B.B_POS_DELTA | B.B_IN_FSPACE, jnp.int32)
            cam_side["pos"] = x0[None, :]
            cn = B._cam_normal(scene)
            cam_side["n_s"] = cn[None, :]
            cam_side["n_g"] = cn[None, :]
        else:
            cam_side = B._static_vertex(cam, t - 1)
        if s == 0:
            lit_side = B._null_vertex(1, False)
        elif s == 1:
            # NEE-resampled emitter endpoint (connect_strategy s==1)
            lit_side = B._null_vertex(1, False)
            lit_side["vtype"] = jnp.full((1,), VERTEX_EMITTER, jnp.int32)
            lit_side["obj_id"] = light_obj[None]
            lit_side["emit_id"] = jnp.full((1,), eid, jnp.int32)
            lit_side["bits"] = scene.emit_bits[eid][None]
            lit_side["pdf_fwd"] = (B._area_pdf(scene, cfg, jnp.full(
                (1,), eid, jnp.int32)) / float(max(cfg.n_emitters, 1)))
            lit_side["n_s"] = n3[None, :]
            lit_side["n_g"] = n3[None, :]
            lit_side["pos"] = x3[None, :]
        else:
            lit_side = B._static_vertex(lit, s - 1)
        w = B._mis_weight(scene, cfg, cam, lit, cam_side, lit_side, s, t)
        weights[(s, t)] = float(np.asarray(w)[0])
    return weights


@pytest.fixture(scope="module")
def cbox_mis():
    scene, cfg, _ = load_scene(os.path.join(SCENE_DIR, "csphere"),
                               "balls-multi-showcase.xml")
    path = _build_path(scene, cfg)
    cam, lit = _make_buffers(scene, cfg, path)
    return scene, cfg, cam, lit, path


def test_mis_weights_sum_to_one(cbox_mis):
    """All four (s,t) splits of the 4-vertex path — light tracing (3,1),
    general connection (2,2), NEE (1,3), unidirectional hit (0,4) — must
    weight to a partition of unity."""
    scene, cfg, cam, lit, path = cbox_mis
    w = _strategy_weights(scene, cfg, cam, lit, path, 4)
    assert all(0.0 <= v <= 1.0 for v in w.values()), w
    total = sum(w.values())
    assert abs(total - 1.0) < 1e-3, (w, total)


def test_mis_weight_perturbation_detected(cbox_mis):
    """Scaling one stored inner pdf_bwd must break the partition of unity
    (this is what a ratio-sweep bookkeeping bug would do)."""
    scene, cfg, cam, lit, path = cbox_mis
    bad = dict(cam)
    # cam pdf_fwd[2] is the stored camera-side area pdf of x2 — the
    # denominator of the NEE strategy's endpoint ratio; corrupting it
    # breaks cross-strategy consistency
    bad["pdf_fwd"] = bad["pdf_fwd"].at[2, 0].mul(10.0)
    w = _strategy_weights(scene, cfg, bad, lit, path, 4)
    total = sum(w.values())
    assert abs(total - 1.0) > 1e-2, (w, total)
