"""Wavefront BVH traversal over the skip-offset flat layout (device side).

The native binned-SAH builder (native/bvh_builder.cpp) emits nodes in DFS
order where each node stores the index of the next node to visit when its
AABB test fails (`skip`); descending on a hit is just `cursor + 1`. That
makes traversal a single per-lane integer cursor — no stack — which maps
cleanly onto a batched lax.while_loop: every iteration does one node fetch
(vectorized gather), one slab test, and a 4-wide masked leaf-primitive test.

This replaces the reference's per-ray DFS walk (tracer/path_tracer.py:
338-422, tracer/ti_bvh.py) with a lane-synchronous wavefront loop.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .math3d import dot, normalize
from .intersect import Interaction, RAY_EPS, FAR

LEAF_MAX = 4          # must match native kLeafMax


def _slab_test(ray_o, inv_d, lo, hi, t_max):
    """Vectorized ray/AABB slab test; True when the box is hit before
    t_max (reference ti_bvh.py:30-53 semantics)."""
    t1 = (lo - ray_o) * inv_d
    t2 = (hi - ray_o) * inv_d
    t_near = jnp.minimum(t1, t2).max(-1)
    t_far = jnp.maximum(t1, t2).min(-1)
    return (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_max)


def _leaf_prim_test(scene, pid, valid, ray_o, ray_d):
    """Single-prim intersection (triangle or sphere) for gathered prim ids.

    Returns (t, u, v) with t = FAR when invalid/miss."""
    p = jnp.maximum(pid, 0)
    is_sph = scene.prim_is_sphere[p]
    # triangle: precomputed plane + dual basis (full-length per-prim arrays)
    tn = scene.prim_n[p]
    o_n = jnp.sum(ray_o * tn, -1)
    d_n = jnp.sum(ray_d * tn, -1)
    safe_dn = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
    t_tri = (scene.prim_d[p] - o_n) / safe_dn
    hitp = ray_o + t_tri[..., None] * ray_d
    u = jnp.sum(hitp * scene.prim_U[p], -1) - scene.prim_cu[p]
    v = jnp.sum(hitp * scene.prim_V[p], -1) - scene.prim_cv[p]
    tri_ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t_tri > RAY_EPS) \
        & (jnp.abs(d_n) >= 1e-12)
    # sphere: quadratic (center in pre0, radius in pre1[...,0])
    center = scene.pre0[p]
    radius = scene.pre1[p][..., 0]
    s2c = center - ray_o
    cn2 = jnp.sum(s2c * s2c, -1)
    proj = jnp.sum(ray_d * s2c, -1)
    c2r = cn2 - proj * proj
    r2 = radius * radius
    cut = jnp.sqrt(jnp.maximum(r2 - c2r, 0.0))
    outside = cn2 > r2 + 1e-4
    t_sph = proj + jnp.where(outside, -cut, cut)
    sph_ok = (c2r < r2) & (t_sph > RAY_EPS)

    t = jnp.where(is_sph, jnp.where(sph_ok, t_sph, FAR),
                  jnp.where(tri_ok, t_tri, FAR))
    t = jnp.where(valid & (pid >= 0), t, FAR)
    return t, u, v


def traverse(scene, ray_o, ray_d, max_t=None, any_hit=False):
    """Closest-hit (or any-hit) BVH traversal for a ray wavefront.

    Returns (best_t, best_prim, best_u, best_v) — best_t clipped at max_t
    and best_prim = -1 on miss. With any_hit=True, lanes stop at the first
    accepted hit (shadow rays)."""
    N = ray_o.shape[0]
    M = scene.bvh_lo.shape[0]
    far0 = jnp.full((N,), FAR, jnp.float32) if max_t is None \
        else jnp.where(max_t > 0.0, max_t - RAY_EPS, FAR)
    inv_d = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-9, 1e-9, ray_d)

    st = dict(cursor=jnp.zeros((N,), jnp.int32),
              best_t=far0,
              best_prim=jnp.full((N,), -1, jnp.int32),
              best_u=jnp.zeros((N,), jnp.float32),
              best_v=jnp.zeros((N,), jnp.float32))

    def cond(st):
        return jnp.any(st["cursor"] < M)

    def body(st):
        c = jnp.minimum(st["cursor"], M - 1)
        active = st["cursor"] < M
        if any_hit:
            active &= st["best_prim"] < 0
        lo = scene.bvh_lo[c]
        hi = scene.bvh_hi[c]
        hit_box = _slab_test(ray_o, inv_d, lo, hi, st["best_t"]) & active
        base = scene.bvh_base[c]
        cnt = scene.bvh_cnt[c]
        is_leaf = cnt > 0

        best_t, best_prim = st["best_t"], st["best_prim"]
        best_u, best_v = st["best_u"], st["best_v"]
        for k in range(LEAF_MAX):
            valid = hit_box & is_leaf & (k < cnt)
            pid = scene.bvh_prim[jnp.minimum(base + k,
                                             scene.bvh_prim.shape[0] - 1)]
            t, u, v = _leaf_prim_test(scene, pid, valid, ray_o, ray_d)
            better = t < best_t
            best_prim = jnp.where(better, pid, best_prim)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
            best_t = jnp.where(better, t, best_t)

        skip = scene.bvh_skip[c]
        cursor = jnp.where(active, jnp.where(hit_box, c + 1, skip), M)
        if any_hit:
            cursor = jnp.where(best_prim >= 0, M, cursor)
        return dict(cursor=cursor, best_t=best_t, best_prim=best_prim,
                    best_u=best_u, best_v=best_v)

    st = jax.lax.while_loop(cond, body, st)
    return st["best_t"], st["best_prim"], st["best_u"], st["best_v"]
