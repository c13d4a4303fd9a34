"""Wavefront unidirectional path tracer with NEE + MIS.

TPU-native re-design of the reference's megakernel integrator
(renderer/vanilla_renderer.py:32-120): instead of one divergent per-pixel
loop, the whole W*H ray wavefront advances through the bounce pipeline in
lockstep inside a lax.fori_loop — intersect -> russian roulette -> NEE ->
emission MIS -> BSDF sample -> re-intersect — with dead rays masked out.
Estimator semantics (RR rule, shadow-ray averaging, MIS weights, light-pick
exclusion of the hit emitter) follow the reference exactly.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bxdf_ops, emitter_ops
from ..ops.intersect import ray_intersect, does_intersect, cluster_key_hint
from ..ops.math3d import dot, normalize, norm
from ..ops.sampling import balance_heuristic
from ..ops.texture_ops import get_uv_item, process_ns
from .base import ProgressiveRenderer, camera_rays, crop_pix_ids
from . import compact


import os as _os
# PT length-compaction schedule (VERDICT r4 #2; machinery + invariants
# in renderer/compact.py): measured cbox 512^2 alive/bounce profile
# 0.93 0.68 0.56 0.47 0.34 0.27 0.22 0.18 0.14 0.06 0.02 0.01. Splits
# must sit safely under each 1/div boundary.
# MEASURED DEAD END on the 8-bounce flagship (keep "" there): bench.py
# 420.6 Mrays/s lane-RNG baseline vs 405.7 with "4:2,7:4" — at ~9.6
# ms/spp the split sorts + prefix re-intersects cost more than the
# ~28% of loop width they save. The machinery pays where passes are
# expensive and deep (VPT -41%; big-scene rows measured separately).
_COMPACT = compact.parse_schedule(
    _os.environ.get("ADAPT_PT_COMPACT", ""))


def _hit_light(mat, it):
    """Emitter id attached to the hit object, -1 if none / miss.

    Reads the emitter id off the already-gathered material row (one shared
    one-hot in gather_mat) instead of a separate table gather."""
    return jnp.where(it.obj_id >= 0, mat.emit, -1)


def render_batch_pt(scene, cfg, key, cnt0, spp, fuse=1, schedule=None):
    """Unjitted wrapper resolving the compaction schedule (a STATIC jit
    key — reading the module global inside the jitted body would bake
    the first caller's schedule into the cache)."""
    if schedule is None:
        schedule = _COMPACT
    return _render_batch_pt(scene, cfg, key, cnt0, spp, fuse, schedule)


@partial(jax.jit, static_argnames=("cfg", "spp", "fuse", "schedule"))
def _render_batch_pt(scene, cfg, key, cnt0, spp, fuse, schedule):
    """spp progressive samples accumulated inside one jit call.

    fuse: samples traced together as one (fuse*N,3) wavefront per loop
    iteration. History: the r1 loop was launch-overhead bound and fuse=4
    won; with the r3 lean bounce carry the overhead is amortized away and
    fuse=1 measures fastest on cbox 512^2 (424.1 vs 338.4 Mrays/s honest,
    2026-08-19) — narrower wavefronts mean smaller HBM fusion temps.
    Re-sweep fuse after any carry change. Returns the SUM of spp
    estimates, (N, 3)."""
    fuse = max(1, min(fuse, spp))
    iters = spp // fuse
    # with a crop window ONLY crop pixels are traced (reference
    # tracer_base.py:39-55 — cropping exists to make renders affordable;
    # full-film-trace-then-mask paid the whole film per sample)
    pix = crop_pix_ids(cfg)
    Nt = cfg.n_pixels if pix is None else int(pix.shape[0])

    def body(i, acc):
        sub = jax.random.fold_in(key, i)
        keys = [jax.random.fold_in(sub, j) for j in range(fuse)]
        ros, rds = [], []
        for j, k in enumerate(keys):
            k_cam, _ = jax.random.split(k)
            ro, rd = camera_rays(scene, cfg, k_cam, cnt0 + i * fuse + j,
                                 pix_ids=pix)
            ros.append(ro)
            rds.append(rd)
        ray_o = jnp.concatenate(ros, axis=0)
        ray_d = jnp.concatenate(rds, axis=0)
        k_tr = jax.random.fold_in(sub, 7919)
        color = trace_pt(scene, cfg, k_tr, ray_o, ray_d,
                         schedule=schedule)
        color = jnp.nan_to_num(color, nan=0.0)
        return acc + color.reshape(fuse, Nt, 3).sum(0)

    acc = jax.lax.fori_loop(0, iters, body,
                            jnp.zeros((Nt, 3), jnp.float32))
    # remainder samples one at a time
    for r in range(spp - iters * fuse):
        sub = jax.random.fold_in(key, iters + 1000 + r)
        k_tr, cam_key = jax.random.split(sub)
        ro, rd = camera_rays(scene, cfg, cam_key,
                             cnt0 + iters * fuse + r, pix_ids=pix)
        acc = acc + jnp.nan_to_num(
            trace_pt(scene, cfg, k_tr, ro, rd, schedule=schedule),
            nan=0.0)
    if pix is None:
        return acc
    return jnp.zeros((cfg.n_pixels, 3), jnp.float32).at[pix].set(acc)


def render_pass_pt(scene, cfg, key, cnt, schedule=None):
    """One progressive sample for every pixel; returns (N, 3) radiance."""
    if schedule is None:
        schedule = _COMPACT
    return _render_pass_impl(scene, cfg, key, cnt, schedule)


@partial(jax.jit, static_argnames=("cfg", "schedule"))
def _render_pass_impl(scene, cfg, key, cnt, schedule=()):
    pix = crop_pix_ids(cfg)
    key, cam_key = jax.random.split(key)
    ray_o, ray_d = camera_rays(scene, cfg, cam_key, cnt, pix_ids=pix)
    color = trace_pt(scene, cfg, key, ray_o, ray_d, schedule=schedule)
    if pix is None:
        return color
    return jnp.zeros((cfg.n_pixels, 3), jnp.float32).at[pix].set(color)


def _finish_it(scene, cfg, it):
    """Normal/bump perturbation + albedo fetch at interaction creation
    (vanilla_renderer.py:42,66).

    Statically an identity when the scene carries no texture of the
    relevant tag: whether any object has a normal/bump/albedo texture is
    known at trace time (cfg.has_*_map, TextureTable.present), and
    ray_intersect already fills it.tex with the -1 "no texture" sentinel.
    Unconditionally rebuilding the interaction here — even with values
    XLA could prove unchanged — cost 31% of flagship throughput in r2 by
    breaking fusion around the bounce-loop carry (VERDICT r2 Weak #1);
    untextured scenes must leave the carried pytree untouched."""
    it = process_ns(scene, cfg, it)
    if scene.tex["albedo"].present:
        tex, _ = get_uv_item(scene, scene.tex["albedo"], it)
        it = dataclasses.replace(it, tex=tex)
    return it


def trace_pt(scene, cfg, key, ray_o, ray_d, schedule=None,
             collect_alive=False):
    """Trace a (N,3) ray wavefront through the full bounce pipeline.

    schedule: length-compaction splits (STATIC; None -> module default
    ADAPT_PT_COMPACT — only safe outside jit). Per-lane RNG is counter-
    based on (bounce, ORIGINAL lane id), so the compacted render equals
    the uncompacted one lane-for-lane (tests/test_pt_compact.py).

    collect_alive (STATIC): additionally return the (max_bounce,) alive
    lane count after each bounce (forces the fully-static loop and no
    compaction — the probe shape auto-compaction derives schedules from)."""
    if schedule is None:
        schedule = _COMPACT
    N = ray_o.shape[0]
    world_ior = scene.world_medium.ior[0]
    S = max(cfg.num_shadow_ray, 1)
    D = 7 + 4 * S                   # uniforms consumed per bounce

    it = _finish_it(scene, cfg, ray_intersect(scene, cfg, ray_o, ray_d))
    mat = bxdf_ops.gather_mat(scene, it.obj_id)
    hit_light = _hit_light(mat, it)

    init = dict(
        ray_o=ray_o, ray_d=ray_d, it=it, mat=mat,
        hit_light=hit_light,
        color=jnp.zeros((N, 3), jnp.float32),
        contribution=jnp.ones((N, 3), jnp.float32),
        emission_weight=jnp.ones((N,), jnp.float32),
        active=jnp.ones((N,), bool),
        pos=jnp.arange(N, dtype=jnp.int32),
    )

    def bounce(b, st):
        it = st["it"]
        active = st["active"] & it.is_hit
        contribution = st["contribution"]
        n = active.shape[0]
        it_key = jax.random.fold_in(key, b)
        u_all = compact.lane_uniform(it_key, st["pos"], D)

        # --- russian roulette (vanilla_renderer.py:50-57) ---
        max_val = jnp.max(contribution, axis=-1)
        if cfg.use_rr:
            candidate = (max_val < cfg.rr_threshold) & (b >= cfg.rr_bounce_th)
            u_rr = u_all[:, 0]
            killed = candidate & (u_rr > max_val)
            boost = jnp.where(candidate, 1.0 / (max_val + 1e-7), 1.0)
            contribution = contribution * boost[..., None]
            active &= ~killed
        else:
            active &= max_val >= 1e-4

        ray_o, ray_d = st["ray_o"], st["ray_d"]
        # dead lanes carry it.t = -3e38 (the alive-cull force-miss): a
        # raw hit_point overflows to +/-3e38 and breeds inf/nan in
        # masked branches downstream. Harmless to the (where-masked)
        # estimate, but any masked forward nan makes jax.grad of the
        # whole image nan (backward where() doesn't block the poisoned
        # branch) — clamp dead lanes to the origin instead. Live-lane
        # values are bit-identical (differentiable rendering depends on
        # this; see tests/test_grad.py).
        hit_point = ray_o + jnp.where(active, it.t, 0.0)[..., None] * ray_d
        mat = st["mat"]

        hit_light = st["hit_light"]

        # --- BSDF sampling for continuation (vanilla_renderer.py:104-108;
        # sampled BEFORE NEE — established RNG stream order (goldens
        # depend on it); only the stream order differs from the
        # reference, the estimator is identical. ---
        u_bsdf = u_all[:, 1:7]
        new_dir, indirect_spec, ray_pdf, is_specular = \
            bxdf_ops.surface_sample(cfg, mat, it, ray_d, u_bsdf, world_ior,
                                    scene=scene)

        # (a fused shadow+continuation intersect — ops/intersect.py
        # intersect_pair — measured a LOSS here: knot290k 12-bounce 512^2
        # same-day pairs 4.03/4.14 fused vs 3.47 s/spp unfused, despite
        # replacing 2 sorts + 2 unsorts with 1 sort + 1 unsort; the
        # experiment lives in ops/intersect.py + scripts/bench_pair.py,
        # OUT of this fusion-fragile loop body)

        # --- next-event estimation (vanilla_renderer.py:67-97) ---
        direct_int = jnp.zeros((n, 3), jnp.float32)
        for _s in range(cfg.num_shadow_ray):
            u_pick = u_all[:, 7 + 4 * _s]
            eid, emitter_pdf, valid = emitter_ops.sample_light_index(
                cfg, u_pick, hit_light)
            u_hit = u_all[:, 8 + 4 * _s:11 + 4 * _s]
            emit_pos, shadow_int, direct_pdf, _n = emitter_ops.sample_hit(
                scene, cfg, eid, hit_point, u_hit)
            to_emitter = emit_pos - hit_point
            emitter_d = norm(to_emitter)
            light_dir = to_emitter / jnp.maximum(emitter_d[..., None], 1e-12)
            occluded = does_intersect(
                scene, cfg, hit_point, light_dir, emitter_d,
                alive=active,
                key_hint=cluster_key_hint(scene, cfg, it, light_dir,
                                          active))
            direct_spec = bxdf_ops.surface_eval(cfg, mat, it, ray_d,
                                                light_dir, world_ior,
                                                scene=scene)
            if cfg.use_mis:
                light_pdf = emitter_pdf * direct_pdf
                bsdf_pdf = bxdf_ops.surface_pdf(cfg, mat, it, light_dir,
                                                ray_d, world_ior,
                                                scene=scene)
                mis_w = jnp.where(emitter_ops.is_delta_pos(scene, eid), 1.0,
                                  balance_heuristic(light_pdf, bsdf_pdf))
            else:
                mis_w = jnp.ones((n,), jnp.float32)
            contrib = direct_spec * shadow_int * (mis_w / emitter_pdf)[..., None]
            ok = valid & ~occluded
            direct_int = direct_int + jnp.where(ok[..., None], contrib, 0.0)
        direct_int = direct_int / float(max(cfg.num_shadow_ray, 1))

        # --- emission hit (vanilla_renderer.py:99-101) ---
        emit_le = emitter_ops.eval_le(scene, jnp.maximum(hit_light, 0),
                                      ray_d, it.n_s)
        emit_int = jnp.where((hit_light >= 0)[..., None], emit_le, 0.0)

        color = st["color"] + jnp.where(
            active[..., None],
            (direct_int + emit_int * st["emission_weight"][..., None])
            * contribution, 0.0)
        contribution = contribution * indirect_spec \
            / jnp.maximum(ray_pdf, 1e-9)[..., None]

        # --- next hit + emission MIS weight (vanilla_renderer.py:109-117) ---
        # dead lanes skip the closest-hit sweep entirely (alive culling);
        # the sort key comes free off the current hit's cluster id. The
        # LAST bounce's next-hit feeds nothing (its emission weight is
        # consumed by the following iteration) — skip the sweep there
        # instead of letting it sit un-DCE'd in the loop carry.
        new_it = jax.lax.cond(
            b < cfg.max_bounce - 1,
            lambda: ray_intersect(scene, cfg, hit_point, new_dir,
                                  alive=active,
                                  key_hint=cluster_key_hint(scene, cfg,
                                                            it, new_dir,
                                                            active)),
            lambda: jax.tree_util.tree_map(jnp.zeros_like, st["it"]))
        # normal/bump maps + albedo applied at interaction creation: the
        # emission-MIS pdf below and every next-bounce consumer then see
        # the SAME mapped shading normal (the reference's vanilla kernel
        # only maps the primary hit, vanilla_renderer.py:42 — mapping
        # every bounce is this port's documented upgrade, and doing it
        # here keeps NEE weight + emission weight summing to 1 on mapped
        # emitters)
        new_it = _finish_it(scene, cfg, new_it)
        new_mat = bxdf_ops.gather_mat(scene, new_it.obj_id)
        new_hit_light = _hit_light(new_mat, new_it)
        if cfg.use_mis:
            surf_delta = new_mat.is_delta & (new_it.obj_id >= 0)
            can_mis = (new_hit_light >= 0) & ~surf_delta & ~is_specular
            e_pdf = jnp.where(
                can_mis,
                emitter_ops.solid_angle_pdf(scene,
                                            jnp.maximum(new_hit_light, 0),
                                            new_it.n_s, new_it.t, new_dir),
                0.0)
            emission_weight = balance_heuristic(ray_pdf, e_pdf)
        else:
            emission_weight = st["emission_weight"]

        return dict(ray_o=hit_point, ray_d=new_dir, it=new_it,
                    mat=new_mat, hit_light=new_hit_light, color=color,
                    contribution=contribution,
                    emission_weight=emission_weight, active=active,
                    pos=st["pos"])

    def reduce_fn(st):
        # it/mat/hit_light are recomputable; sorting them would put the
        # split's global sort past the compile cliff (see compact.py)
        return {k: st[k] for k in ("ray_o", "ray_d", "color",
                                   "contribution", "emission_weight",
                                   "active", "pos")}

    def restore_fn(core):
        it = _finish_it(scene, cfg, ray_intersect(
            scene, cfg, core["ray_o"], core["ray_d"],
            alive=core["active"]))
        mat = bxdf_ops.gather_mat(scene, it.obj_id)
        return dict(core, it=it, mat=mat, hit_light=_hit_light(mat, it))

    if collect_alive:
        log = []
        color = compact.run_compacted(bounce, init, cfg.max_bounce, (),
                                      unroll=1, alive_log=log)
        return color, jnp.stack(log)
    return compact.run_compacted(bounce, init, cfg.max_bounce, schedule,
                                 unroll=1, reduce_fn=reduce_fn,
                                 restore_fn=restore_fn)


@partial(jax.jit, static_argnames=("cfg",))
def probe_alive_pt(scene, cfg, key, cnt):
    """One full pass that ALSO returns the (max_bounce,) alive counts —
    the auto-compaction probe. Radiance is returned so the probe sample
    is accumulated, not wasted."""
    key, cam_key = jax.random.split(key)
    ray_o, ray_d = camera_rays(scene, cfg, cam_key, cnt)
    return trace_pt(scene, cfg, key, ray_o, ray_d, schedule=(),
                    collect_alive=True)


# Auto-compaction gate: scenes with at least this many prims derive a
# per-scene schedule from a first-pass alive probe (compact.
# derive_schedule). Small/cheap passes measured compaction as a wash
# (the cbox flagship dead end above), so they stay schedule-free.
_AUTO_MIN_PRIMS = int(_os.environ.get("ADAPT_PT_AUTO_COMPACT", "20000"))


class Renderer(ProgressiveRenderer):
    """Unidirectional MIS path tracer (reference vanilla_renderer.py:22).

    Big scenes (>= ADAPT_PT_AUTO_COMPACT prims, default 20000) probe the
    alive profile on their first pass and length-compact every later
    pass with the derived schedule (measured: knot290k 2.56 -> 2.33
    s/spp, ite-orb 5.47 -> 2.25; an explicit ADAPT_PT_COMPACT env
    schedule wins over auto)."""

    def __init__(self, scene, cfg, seed: int = 0):
        super().__init__(scene, cfg, seed)
        self._sched = _COMPACT if _COMPACT else None
        n_prims = (scene.tri_gid.shape[0] + scene.sph_gid.shape[0])
        self._auto = (not _COMPACT) and n_prims >= _AUTO_MIN_PRIMS

    def _schedule(self):
        if self._auto and self._sched is None:
            # side-effect-free probe: a fold_in key off the CURRENT state
            # (self.key untouched) and a discarded sample keep the RNG
            # stream identical to a schedule-free renderer, so auto ==
            # plain exactly (test_pt_compact.py); the one probe pass
            # amortizes over the render
            _, counts = probe_alive_pt(self.scene, self.cfg,
                                       jax.random.fold_in(self.key, 0x5EED),
                                       jnp.int32(1))
            profile = np.asarray(counts, np.float64) / self.cfg.n_pixels
            self._sched = compact.derive_schedule(profile,
                                                  self.cfg.max_bounce)
        return self._sched or ()

    def render_pass(self, key, cnt):
        return render_pass_pt(self.scene, self.cfg, key,
                              jnp.asarray(cnt, jnp.int32),
                              schedule=self._schedule())

    def render_batch(self, spp: int, fuse: int = 1):
        sched = self._schedule()
        self.key, sub = jax.random.split(self.key)
        acc = render_batch_pt(self.scene, self.cfg, sub,
                              jnp.int32(self.cnt + 1), spp, fuse,
                              schedule=sched)
        self.cnt += spp
        self.color = self.color + acc.reshape(self.cfg.w, self.cfg.h, 3)
        return self.color
