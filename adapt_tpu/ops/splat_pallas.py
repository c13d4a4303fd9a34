"""Pallas TPU kernel for the BDPT t=1 film splat (sorted scatter-add).

Why this exists: the t=1 light-tracing strategies scatter ~K*N radiance
updates into the (P, 3) film every pass. XLA's scatter-add — even with
the stream pre-sorted by pixel and `indices_are_sorted` — measured
27.25 ms at the bench shape (K=6, N=P=512^2; scripts/bench_splat.py,
2026-08-20), the single largest op in a 96 ms BDPT pass. A scatter is a
serialized read-modify-write per update; but with the stream ALREADY
sorted, each film tile's updates are one contiguous segment, so the add
can instead be a dense VPU one-hot accumulation over tile-resident
VMEM:

  - XLA side: bucket offsets per SUPER_PX-pixel film tile (a tiny
    (G+1,) histogram + cumsum of the sorted stream's supertile ids);
  - kernel, per grid step (one film tile): DMA the tile's update
    window (aligned to CCH lanes), then for each CCH-lane chunk build
    a (SUPER_PX, CCH) one-hot of local pixel ids (pixels on sublanes,
    updates on lanes — no transposes anywhere) and lane-reduce
    oh * rgb into the (SUPER_PX, 3) tile accumulator.

Exactness: 0/1 one-hot weights are exact; the per-pixel ADD ORDER
changes (chunk-tree reduction vs sequential scatter), so results match
the scatter up to f32 reassociation (~1e-7 rel, same class as the
sorted-scatter rewrite it replaces; tests/test_splat_pallas.py).

Soundness: a skewed stream (one tile holding more than MAX_WIN
updates, e.g. a caustic hot spot) makes the static window infeasible —
the wrapper detects it on the XLA side and lax.cond's to the plain
scatter path, which is always correct.

Reference behavior: the t=1 strategy family of renderer/bdpt.py
(reference bdpt.py connect path, splat accumulation onto the film).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUPER_PX = 1024     # film pixels per grid step
CCH = 512           # updates per in-kernel chunk (lane dim; 128-aligned)
MAX_WIN = 16384     # static per-tile update-window cap (CCH multiple);
#                     mean occupancy at the bench shape is ~6k, so the
#                     2.7x headroom makes the scatter fallback rare

_INTERPRET = False  # flipped by tests on backends without Mosaic


def _splat_kernel(win0_ref, start_ref, end_ref, idx_hbm, rgb_hbm, film_ref,
                  out_ref, acc_ref, idx_win, rgb_win, sem_i, sem_r):
    g = pl.program_id(0)
    w0 = win0_ref[g]
    s = start_ref[g]
    e = end_ref[g]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(e > w0)
    def _():
        di = pltpu.make_async_copy(
            idx_hbm.at[:, pl.ds(w0, MAX_WIN)], idx_win, sem_i)
        dr = pltpu.make_async_copy(
            rgb_hbm.at[:, pl.ds(w0, MAX_WIN)], rgb_win, sem_r)
        di.start()
        dr.start()
        di.wait()
        dr.wait()
        base_px = g * SUPER_PX
        iota_px = jax.lax.broadcasted_iota(jnp.int32, (SUPER_PX, CCH), 0)
        iota_ln = jax.lax.broadcasted_iota(jnp.int32, (1, CCH), 1)
        for j in range(MAX_WIN // CCH):
            @pl.when(w0 + j * CCH < e)
            def _(j=j):
                ii = idx_win[:, j * CCH:(j + 1) * CCH]       # (1, CCH)
                pos = w0 + j * CCH + iota_ln
                valid = (pos >= s) & (pos < e)
                loc = ii - base_px                            # (1, CCH)
                # pixels on sublanes, updates on lanes: out-of-tile and
                # out-of-segment lanes simply match no pixel row
                oh = jnp.where((iota_px == loc) & valid, 1.0, 0.0)
                for ch in range(3):
                    rc = rgb_win[ch:ch + 1, j * CCH:(j + 1) * CCH]
                    col = jnp.sum(oh * rc, axis=1, keepdims=True)
                    acc_ref[:, ch:ch + 1] += col

    out_ref[...] = film_ref[...] + acc_ref[...]


def _bucket_offsets(sid, G):
    """(G+1,) exclusive prefix offsets of the SORTED supertile ids.

    The histogram is a scatter-add into G+1 lanes — tiny target, and
    measured as noise next to the stream sort that precedes it."""
    counts = jnp.zeros((G,), jnp.float32).at[sid].add(
        1.0, mode="drop")                    # sid >= G (invalid) drops
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts).astype(jnp.int32)])
    return offs


def splat_sorted_accumulate(film, idx, r, g, b):
    """film (P, 3) += sorted-stream scatter-add via the tile kernel.

    idx (M,) i32 ascending; entries >= P are dropped (the callers'
    `drop` sentinel sorts to the tail). Falls back to lax scatter-add
    when P is not tile-divisible or the stream is too skewed."""
    P = film.shape[0]
    M = idx.shape[0]

    def scatter(args):
        film, idx, r, g, b = args
        return jax.lax.scatter_add(
            film, idx[:, None], jnp.stack([r, g, b], -1),
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,)),
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

    if P % SUPER_PX != 0 or M == 0:
        return scatter((film, idx, r, g, b))
    G = P // SUPER_PX

    offs = _bucket_offsets(jnp.asarray(idx, jnp.int32) // SUPER_PX, G)
    win0 = (offs[:G] // CCH) * CCH
    feasible = jnp.max(offs[1:] - win0) <= MAX_WIN

    # sentinel-pad so every window slice [win0, win0 + MAX_WIN) is in
    # bounds; padding sorts conceptually at the tail (idx = P)
    pad = MAX_WIN + (-M) % CCH
    idx_p = jnp.pad(idx, (0, pad), constant_values=P)[None, :]
    rgb_p = jnp.pad(jnp.stack([r, g, b], 0), ((0, 0), (0, pad)))

    def pallas_path(args):
        film, idx_p, rgb_p, win0, offs = args
        grid = (G,)
        fblk = pl.BlockSpec((SUPER_PX, 3), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
        stream = pl.BlockSpec(memory_space=pl.ANY)
        return pl.pallas_call(
            _splat_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[stream, stream, fblk],
                out_specs=fblk,
                scratch_shapes=[
                    pltpu.VMEM((SUPER_PX, 3), jnp.float32),
                    pltpu.VMEM((1, MAX_WIN), jnp.int32),
                    pltpu.VMEM((3, MAX_WIN), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(())]),
            out_shape=jax.ShapeDtypeStruct((P, 3), jnp.float32),
            interpret=_INTERPRET,
        )(win0, offs[:G], offs[1:], idx_p, rgb_p, film)

    return jax.lax.cond(
        feasible, pallas_path,
        lambda args: scatter((args[0], idx, r, g, b)),
        (film, idx_p, rgb_p, win0, offs))
