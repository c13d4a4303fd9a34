"""Pallas TPU kernel for wavefront ray-triangle intersection.

Why this exists: the jnp brute-force scan (ops/intersect.py) is HBM-bound —
xprof on the cbox 512^2 PT dispatch shows ~64% of device self-time in the
chunk scan's reduce/select ops, because every (N, C) pair-dot intermediate
(6 dot tables + t/u/v/valid) round-trips through HBM each scan step. This
kernel keeps the whole per-tile working set in VMEM: rays stream in as
(3, B) lane-major tiles, the full triangle SoA (small scenes only; BVH
handles large ones) sits in VMEM across the grid, and only best-hit records
leave the chip. The math is identical to ops/intersect.py `_tri_hit_chunk`
(plane + dual-basis barycentric form, same op order, exact f32 on the VPU)
so hit decisions agree with the jnp path (floats up to FMA-fusion rounding,
~1 ULP; validated in tests/test_pallas_intersect.py).

Reference behavior: tracer_base.py:199-214 (triangle test contract),
ray_intersect/does_intersect dispatch (tracer_base.py:159-278).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_EPS = 1e-4
FAR = 1e7
LANE_B = 2048          # rays per grid step (4096 measured worse: VMEM
                       # pressure degrades the DMA pipeline)
MAX_PALLAS_TRIS = 256  # above this the BVH path is the right tool

_INTERPRET = False     # flipped by tests on backends without Mosaic


def _dot3(tab, vec):
    """(Tp,3) x (3,B) -> (Tp,B) exact f32 dots on the VPU.

    Same multiply/add order as ops/intersect.py `_pair_dots` (sum over a
    size-3 axis) so results match the jnp path up to FMA rounding.
    Measured: routing these through the MXU (dot_general, HIGHEST) is
    1.4x SLOWER end-to-end — at K=3 the systolic array does no useful
    work, confirming the repo-wide no-matmul rule for geometry."""
    return (tab[:, 0:1] * vec[0:1, :] + tab[:, 1:2] * vec[1:2, :]) \
        + tab[:, 2:3] * vec[2:3, :]


def _tri_kernel(ro_ref, rd_ref, far_ref, tn_ref, td_ref, tU_ref, tV_ref,
                tcu_ref, tcv_ref, tobj_ref, tng_ref, t_out, idx_out, u_out,
                v_out, ng_out, obj_out):
    ro = ro_ref[:]                     # (3, B)
    rd = rd_ref[:]
    tn = tn_ref[:]                     # (Tp, 3); zero rows on padding
    Tp = tn.shape[0]

    o_n = _dot3(tn, ro)
    d_n = _dot3(tn, rd)
    o_u = _dot3(tU_ref[:], ro)
    d_u = _dot3(tU_ref[:], rd)
    o_v = _dot3(tV_ref[:], ro)
    d_v = _dot3(tV_ref[:], rd)

    denom = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
    t = (td_ref[:] - o_n) / denom      # td_ref (Tp, 1) broadcasts
    u = o_u + t * d_u - tcu_ref[:]
    v = o_v + t * d_v - tcv_ref[:]
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > RAY_EPS) \
        & (jnp.abs(d_n) >= 1e-12)      # padding rows have d_n == 0
    tm = jnp.where(valid, t, FAR)

    best_t = jnp.min(tm, axis=0, keepdims=True)              # (1, B)
    row = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    # first row achieving the min == jnp.argmin semantics
    best_i = jnp.min(jnp.where(tm == best_t, row, Tp), axis=0,
                     keepdims=True)
    hit = best_t < far_ref[:]
    one_hot = row == best_i

    def sel(vals, miss):
        return jnp.where(hit, jnp.sum(jnp.where(one_hot, vals, 0.0),
                                      axis=0, keepdims=True), miss)

    t_out[:] = jnp.where(hit, best_t, far_ref[:])
    idx_out[:] = jnp.where(hit, best_i, -1)
    u_out[:] = sel(u, 0.0)
    v_out[:] = sel(v, 0.0)
    # geometric normal from the VMEM table (the OBJ loader's n_g, which
    # differs from the plane normal tn by ~1 ULP rounding); (1,0,0) on a
    # miss matches _assemble_interaction's default_n
    tng = tng_ref[:]
    ng_out[0:1, :] = sel(tng[:, 0:1], 1.0)
    ng_out[1:2, :] = sel(tng[:, 1:2], 0.0)
    ng_out[2:3, :] = sel(tng[:, 2:3], 0.0)
    obj_out[:] = jnp.where(
        hit, jnp.sum(jnp.where(one_hot, tobj_ref[:], 0), axis=0,
                     keepdims=True), -1)


def _occ_kernel(ro_ref, rd_ref, far_ref, tn_ref, td_ref, tU_ref, tV_ref,
                tcu_ref, tcv_ref, tobj_ref, tng_ref, occ_out):
    ro = ro_ref[:]
    rd = rd_ref[:]
    tn = tn_ref[:]

    o_n = _dot3(tn, ro)
    d_n = _dot3(tn, rd)
    o_u = _dot3(tU_ref[:], ro)
    d_u = _dot3(tU_ref[:], rd)
    o_v = _dot3(tV_ref[:], ro)
    d_v = _dot3(tV_ref[:], rd)

    denom = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
    t = (td_ref[:] - o_n) / denom
    u = o_u + t * d_u - tcu_ref[:]
    v = o_v + t * d_v - tcv_ref[:]
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > RAY_EPS) \
        & (jnp.abs(d_n) >= 1e-12) & (t < far_ref[:])
    occ_out[:] = jnp.any(valid, axis=0, keepdims=True)


def _pad_tris(scene):
    """Triangle SoA padded to a sublane multiple; zero normals mark pads."""
    T = scene.tri_n.shape[0]
    Tp = max(8, -(-T // 8) * 8)
    pad = Tp - T

    def p(x, fill=0):
        width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, width, constant_values=fill)

    return (p(scene.tri_n), p(scene.tri_d).reshape(Tp, 1),
            p(scene.tri_U), p(scene.tri_V),
            p(scene.tri_cu).reshape(Tp, 1), p(scene.tri_cv).reshape(Tp, 1),
            p(scene.tri_obj, -1).reshape(Tp, 1),
            p(scene.prim_ng[scene.tri_gid]))


def _ray_blocks(ray_o, ray_d, far0):
    """Lane-major (3, Np) rays padded to a LANE_B multiple."""
    N = ray_o.shape[0]
    Np = -(-N // LANE_B) * LANE_B
    ro = jnp.pad(ray_o.T, ((0, 0), (0, Np - N)))
    rd = jnp.pad(ray_d.T, ((0, 0), (0, Np - N)), constant_values=1.0)
    far = jnp.pad(far0.reshape(1, N), ((0, 0), (0, Np - N)))
    return ro, rd, far, Np


@functools.lru_cache(maxsize=None)
def _specs(Np):
    grid = (Np // LANE_B,)
    ray_spec = pl.BlockSpec((3, LANE_B), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    far_spec = pl.BlockSpec((1, LANE_B), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)   # whole table resident
    out_spec = pl.BlockSpec((1, LANE_B), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return grid, [ray_spec, ray_spec, far_spec] + [tri_spec] * 8, out_spec


def tri_closest_hit(scene, ray_o, ray_d, far0):
    """Closest triangle hit for a ray batch.

    Returns (t, tri_row, u, v, n_g, obj): t = far0, tri_row/obj = -1 and
    n_g = (1,0,0) on miss; tri_row indexes scene.tri_* (map to a global
    prim id via scene.tri_gid). n_g/obj come straight from the kernel's
    VMEM tables, saving two HBM-wide one-hot gathers downstream."""
    N = ray_o.shape[0]
    tris = _pad_tris(scene)
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    grid, in_specs, out_spec = _specs(Np)
    ng_spec = pl.BlockSpec((3, LANE_B), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    t, idx, u, v, ng, obj = pl.pallas_call(
        _tri_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 4 + [ng_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((1, Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, Np), jnp.int32),
                   jax.ShapeDtypeStruct((1, Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, Np), jnp.float32),
                   jax.ShapeDtypeStruct((3, Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, Np), jnp.int32)],
        interpret=_INTERPRET,
    )(ro, rd, far, *tris)
    return (t[0, :N], idx[0, :N], u[0, :N], v[0, :N], ng[:, :N].T,
            obj[0, :N])


def tri_any_hit(scene, ray_o, ray_d, far0):
    """True where any triangle lies strictly before far0."""
    N = ray_o.shape[0]
    tris = _pad_tris(scene)
    ro, rd, far, Np = _ray_blocks(ray_o, ray_d, far0)
    grid, in_specs, out_spec = _specs(Np)
    occ = pl.pallas_call(
        _occ_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.bool_),
        interpret=_INTERPRET,
    )(ro, rd, far, *tris)
    return occ[0, :N]
