"""Intersection correctness vs an independent Möller-Trumbore oracle.

Covers reference behaviors in tracer/tracer_base.py:159-278 (closest hit,
shadow occlusion, max-depth clipping, sphere quadratic).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.ops.intersect import ray_intersect, does_intersect

from conftest import SCENE_DIR
from reference_impl import mt_intersect, mt_occluded


@pytest.fixture(scope="module")
def cbox():
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    return scene, cfg


def scene_tris(scene):
    p0 = np.asarray(scene.pre2)
    return np.stack([p0, p0 + np.asarray(scene.pre0),
                     p0 + np.asarray(scene.pre1)], axis=1)


def random_rays(scene, n, seed):
    rng = np.random.RandomState(seed)
    lo = np.asarray(scene.obj_aabb_min).min(0)
    hi = np.asarray(scene.obj_aabb_max).max(0)
    o = rng.uniform(lo - 0.5, hi + 0.5, (n, 3)).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_closest_hit_matches_oracle(cbox):
    scene, cfg = cbox
    o, d = random_rays(scene, 256, 0)
    it = ray_intersect(scene, cfg, jnp.asarray(o), jnp.asarray(d))
    tris = scene_tris(scene)
    for i in range(o.shape[0]):
        t_ref, p_ref, _, _ = mt_intersect(o[i], d[i], tris)
        if p_ref < 0:
            assert not bool(it.is_hit[i])
        else:
            # prim identity may differ on coplanar ties (floor vs box
            # bottom); the hit distance must agree regardless
            assert float(it.t[i]) == pytest.approx(t_ref, rel=1e-4)


def test_batch_equals_single_ray(cbox):
    """Batched geometry must be bitwise-stable wrt batch size (guards the
    reduced-precision-matmul class of bug)."""
    scene, cfg = cbox
    o, d = random_rays(scene, 64, 1)
    it_b = ray_intersect(scene, cfg, jnp.asarray(o), jnp.asarray(d))
    for i in range(0, 64, 7):
        it_s = ray_intersect(scene, cfg, jnp.asarray(o[i:i + 1]),
                             jnp.asarray(d[i:i + 1]))
        assert int(it_s.prim_id[0]) == int(it_b.prim_id[i])
        assert float(it_s.t[0]) == pytest.approx(float(it_b.t[i]), rel=1e-6)


def test_occlusion_matches_oracle(cbox):
    scene, cfg = cbox
    o, d = random_rays(scene, 256, 2)
    max_t = np.full(256, 2.5, np.float32)
    occ = does_intersect(scene, cfg, jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(max_t))
    tris = scene_tris(scene)
    for i in range(256):
        assert bool(occ[i]) == mt_occluded(o[i], d[i], 2.5, tris)


def test_shadow_rays_from_surface_no_acne(cbox):
    """Shadow rays re-launched from hit points must not self-occlude."""
    scene, cfg = cbox
    # rays from the camera into the box
    cam_t = np.asarray(scene.cam_t)
    rng = np.random.RandomState(3)
    d = rng.randn(512, 3).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5  # forward
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d @ np.asarray(scene.cam_r).T
    o = np.broadcast_to(cam_t, (512, 3)).astype(np.float32)
    it = ray_intersect(scene, cfg, jnp.asarray(o), jnp.asarray(d))
    hp = o + np.asarray(it.t)[:, None] * d
    light = np.asarray(scene.emit_pos[0])
    to_l = light[None] - hp
    dist = np.linalg.norm(to_l, axis=-1)
    ld = to_l / dist[:, None]
    occ = does_intersect(scene, cfg, jnp.asarray(hp), jnp.asarray(ld),
                         jnp.asarray(dist))
    tris = scene_tris(scene)
    hit = np.asarray(it.is_hit)
    for i in range(0, 512, 5):
        if not hit[i]:
            continue
        assert bool(occ[i]) == mt_occluded(hp[i], ld[i], float(dist[i]), tris)


def test_sphere_intersection():
    scene, cfg, _ = load_scene(SCENE_DIR + "/csphere/", "balls-mono.xml")
    # rays aimed at each sphere's center must hit that sphere at ~d - r
    centers = np.asarray(scene.sph_center)
    radii = np.asarray(scene.sph_radius)
    cam = np.asarray(scene.cam_t)
    for c, r in zip(centers, radii):
        d = c - cam
        dist = np.linalg.norm(d)
        d = (d / dist).astype(np.float32)
        it = ray_intersect(scene, cfg, jnp.asarray(cam[None]),
                           jnp.asarray(d[None]))
        assert bool(it.is_hit[0])
        assert float(it.t[0]) <= dist - r + 1e-3
        # normal at hit must face the camera
        assert float(jnp.sum(it.n_g[0] * jnp.asarray(d))) < 0.0


def test_vertex_normal_interpolation():
    """Barycentric shading-normal interpolation (reference
    obj_loader.py:21-80 + tracer_base n_s path): on the smooth-ball
    stand-in (UV sphere with vn), interpolated n_s must be ~radial and
    differ from the facet n_g; the flat ball (no vn) falls back to n_g.
    (VERDICT r1 #8: this path existed but was never exercised.)"""
    import os
    import dataclasses
    scene_dir = os.path.join(os.path.dirname(__file__), "..", "scenes")
    if not os.path.exists(os.path.join(scene_dir, "meshes", "cornell",
                                       "smooth-ball.obj")):
        pytest.skip("vn stand-ins not generated (scripts/gen_procedural)")
    from adapt_tpu.scene.compile import load_scene
    scene, cfg, _ = load_scene(os.path.join(scene_dir, "cbox"),
                               "cbox-vn.xml")
    assert cfg.has_v_normal

    def shoot(center):
        # fan of rays from a point toward the ball center
        n = 64
        rng = np.random.RandomState(0)
        offs = rng.normal(size=(n, 3)).astype(np.float32) * 0.2
        origin = np.float32([2.8, 2.5, -2.0])
        ro = jnp.asarray(np.tile(origin, (n, 1)))
        to = np.float32(center)[None, :] + offs - origin[None, :]
        rd = jnp.asarray(to / np.linalg.norm(to, axis=1, keepdims=True))
        it = ray_intersect(scene, cfg, ro, rd)
        p = np.asarray(ro + it.t[:, None] * rd)
        return it, p

    # smooth ball at (3.8, 1.0, 3.2) r=1 (gen_procedural)
    it, p = shoot([3.8, 1.0, 3.2])
    hit_ball = np.asarray(it.is_hit) & (
        np.linalg.norm(p - np.float32([3.8, 1.0, 3.2]), axis=1) < 1.05)
    assert hit_ball.sum() > 16
    radial = p[hit_ball] - np.float32([3.8, 1.0, 3.2])
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    n_s = np.asarray(it.n_s)[hit_ball]
    n_g = np.asarray(it.n_g)[hit_ball]
    cos_s = np.einsum("nd,nd->n", n_s, radial)
    assert cos_s.min() > 0.995, cos_s.min()         # interpolated ~radial
    # shading normal differs from the facet normal almost everywhere
    assert (np.einsum("nd,nd->n", n_s, n_g) < 0.99999).mean() > 0.5

    # flat ball at (1.6, 1.0, 1.4): no vn -> n_s == n_g
    it2, p2 = shoot([1.6, 1.0, 1.4])
    hit2 = np.asarray(it2.is_hit) & (
        np.linalg.norm(p2 - np.float32([1.6, 1.0, 1.4]), axis=1) < 1.05)
    assert hit2.sum() > 16
    np.testing.assert_allclose(np.asarray(it2.n_s)[hit2],
                               np.asarray(it2.n_g)[hit2], atol=1e-6)
