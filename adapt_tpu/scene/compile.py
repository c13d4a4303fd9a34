"""Scene compiler: host object model -> flat SoA device arrays.

This is the host->device boundary of the framework. The XML parse produces
numpy host records (bxdf/emitters/world/textures + ObjDescriptors); this
module flattens them into `SceneData`, a registered pytree of jnp arrays laid
out for the wavefront kernels:

 * triangles carry a precomputed plane + dual-basis form (n, d, U, V, cu, cv)
   so the hot ray/triangle test becomes two (N,3)@(3,T) matmuls on the MXU
   (see ops/intersect.py) instead of a per-ray solve — the TPU-native
   equivalent of the reference's matrix-inverse test (tracer_base.py:199-214);
 * spheres live in their own SoA (the reference's padded-prim convention,
   xml_parser.py:156-158, is preserved only in global prim indexing);
 * materials / media / emitters become per-object and per-emitter tables
   indexed by gathered ids at shading time.

Static (shape-determining / python) configuration lives in `RenderConfig`,
which is hashable and passed as a jit static argument.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import SPHERE
from ..ops.math3d import np_rotation_between, fov2focal


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@dataclasses.dataclass
class TextureTable:
    """Per-object texture slots for one tag (albedo/normal/bump/roughness).

    mode -255 marks 'no texture' (reference bxdf/texture.py:92-96)."""
    mode: jnp.ndarray      # (O,) i32: 0 image, 1 checker, -255 invalid
    off_x: jnp.ndarray     # (O,) i32 atlas offsets
    off_y: jnp.ndarray
    w: jnp.ndarray         # (O,) f32 native texture size
    h: jnp.ndarray
    scale_u: jnp.ndarray   # (O,) f32
    scale_v: jnp.ndarray
    c1: jnp.ndarray        # (O,3) checker colors
    c2: jnp.ndarray
    atlas: jnp.ndarray     # (S,S,3) packed atlas ((1,1,3) dummy if unused)
    present: bool = False  # STATIC: any object carries this tag (prunes the
                           # whole per-bounce fetch for texture-less tags)


jax.tree_util.register_dataclass(
    TextureTable,
    data_fields=[f.name for f in dataclasses.fields(TextureTable)
                 if f.name != "present"],
    meta_fields=["present"])


@_register
@dataclasses.dataclass
class MediumTable:
    """Per-object (or world) homogeneous-medium parameters."""
    kind: jnp.ndarray      # (...,) i32 MediumTag
    ior: jnp.ndarray       # (...,) f32
    u_a: jnp.ndarray       # (...,3)
    u_s: jnp.ndarray
    u_e: jnp.ndarray
    ph_par: jnp.ndarray    # (...,3) phase params
    ph_pdf: jnp.ndarray    # (...,3) multi-HG lobe weights


@_register
@dataclasses.dataclass
class SceneData:
    """Flat device-side scene representation (all jnp arrays)."""
    # --- triangles (T): matmul-intersector form ---
    tri_gid: jnp.ndarray    # (T,) i32 global prim index
    tri_obj: jnp.ndarray    # (T,) i32 owning object
    tri_n: jnp.ndarray      # (T,3) unit plane normal
    tri_d: jnp.ndarray      # (T,) plane offset dot(n, p0)
    tri_U: jnp.ndarray      # (T,3) dual basis for barycentric u
    tri_V: jnp.ndarray      # (T,3)
    tri_cu: jnp.ndarray     # (T,) dot(U, p0)
    tri_cv: jnp.ndarray     # (T,)
    # --- spheres (S_) ---
    sph_gid: jnp.ndarray    # (S_,) i32 global prim index
    sph_obj: jnp.ndarray    # (S_,) i32
    sph_center: jnp.ndarray  # (S_,3)
    sph_radius: jnp.ndarray  # (S_,)
    # --- global prim arrays (P = T + S_), reference-compatible layout ---
    prim_ng: jnp.ndarray    # (P,3) geometric normals
    prim_vn: jnp.ndarray    # (P,3,3) vertex normals (zeros when absent)
    prim_uv: jnp.ndarray    # (P,3,2) uv coords
    pre0: jnp.ndarray       # (P,3) e1 (tri) / center (sphere)
    pre1: jnp.ndarray       # (P,3) e2 (tri) / radius row (sphere)
    pre2: jnp.ndarray       # (P,3) p0 (tri) / zeros (sphere)
    # --- objects (O) ---
    obj_start: jnp.ndarray      # (O,) first global prim id
    obj_cnt: jnp.ndarray        # (O,) prim count
    obj_is_sphere: jnp.ndarray  # (O,) i32
    obj_emitter: jnp.ndarray    # (O,) i32 emitter id or -1
    obj_aabb_min: jnp.ndarray   # (O,3)
    obj_aabb_max: jnp.ndarray   # (O,3)
    # --- material table (O) ---
    mat_type: jnp.ndarray     # (O,) i32 BRDFTag / BSDFTag
    mat_is_bsdf: jnp.ndarray  # (O,) bool
    mat_is_delta: jnp.ndarray  # (O,) bool
    mat_kd: jnp.ndarray       # (O,3)
    mat_ks: jnp.ndarray
    mat_kg: jnp.ndarray
    mat_mean: jnp.ndarray     # (O,3) channel means (mod-phong sampling)
    medium: MediumTable       # (O,) attached media (transparent for BRDFs)
    # NOTE: the "(O,)" material tables above (and obj_emitter) actually
    # hold O + K rows when the scene declares BxDF mixtures: K component
    # records are appended so mixture_ops delegates via ordinary row
    # gathers. All other (O,) object tables stay length O.
    mixture: Any              # ops.mixture_ops.MixtureTable | None (static
                              # by pytree structure: None = no mixtures)
    obj_mixture: jnp.ndarray  # (O+K,) i32 mixture-table row or -1
    # --- emitters (E) ---
    emit_kind: jnp.ndarray      # (E,) i32 EmitterTag
    emit_intensity: jnp.ndarray  # (E,3)
    emit_pos: jnp.ndarray       # (E,3)
    emit_dir: jnp.ndarray       # (E,3)
    emit_inv_area: jnp.ndarray  # (E,)
    emit_r: jnp.ndarray         # (E,)
    emit_bits: jnp.ndarray      # (E,) i32 bool_bits
    emit_obj: jnp.ndarray       # (E,) i32 attached object or -1
    emit_time: jnp.ndarray      # (E,)
    # --- world ---
    sky: jnp.ndarray            # (3,)
    ambient: jnp.ndarray        # (3,)
    world_medium: MediumTable   # scalar-shaped medium
    # --- camera ---
    cam_r: jnp.ndarray          # (3,3)
    cam_t: jnp.ndarray          # (3,)
    # --- textures ---
    tex: dict                   # {tag: TextureTable}
    # --- heterogeneous grid volume (dummy when cfg.volume_kind == 0) ---
    volume: Any
    # --- BVH (skip-offset flat layout; 1-node dummies when not built) ---
    # BVH traversal tables, PACKED so each traversal step is one row-gather
    # per node and one per leaf slot (45 separate per-lane gathers/step made
    # the 290k-prim walk ~50x slower than bandwidth on TPU)
    bvh_node_pack: jnp.ndarray  # (M,9) f32: lo(3) hi(3) base cnt skip
    bvh_prim_pack: jnp.ndarray  # (P,14) f32, leaf-contiguous order:
                                #   n|center(3) d|radius(1) U(3) cu(1)
                                #   V(3) cv(1) is_sphere(1) gid(1)
    # two-level cluster decomposition for the Pallas big-scene intersector
    # (ops/cluster_pallas.py): subtree cuts of the SAH tree, each cluster's
    # prim rows padded to a fixed block so one DMA streams it into VMEM
    cl_aabb: jnp.ndarray        # (C,8) f32: lo(3) hi(3) pad(2)
    cl_rows: jnp.ndarray        # (C,24,CM) f32 rows: n|c(3) d|r(1) U(3) cu(1)
                                #   V(3) cv(1) sph(1) gid(1) ng(3) obj(1)
    cl_aabb_t: jnp.ndarray      # (8,Cp) f32 transposed: rows 0:3 lo,
                                #   3:6 hi; Cp = C padded to 128 (pad
                                #   clusters lo=+big so slabs never hit)
    cl_chunk: jnp.ndarray       # (C*8,K) f32 per-128-prim-chunk AABBs,
                                #   fields on sublanes, chunks on lanes:
                                #   [c*8+f, q]; f 0:3 lo, 3:6 hi
                                #   (K = CM/128; empty chunks lo>hi)
    cl_rows_pm: jnp.ndarray     # (C*CM,24) f32: cl_rows prim-MAJOR, so
                                #   the deferred winner resolve is ONE
                                #   contiguous row-gather per lane (16
                                #   scattered scalar gathers off the
                                #   field-major table measured 37.6 ms
                                #   per bounce at 512^2 — 17% of the
                                #   knot290k render)
    # full-length per-prim test data (triangle plane/dual-basis; zeros for
    # sphere prims which use pre0/pre1 instead)
    prim_obj: jnp.ndarray        # (P,) i32 owning object
    prim_is_sphere: jnp.ndarray  # (P,) bool
    prim_n: jnp.ndarray          # (P,3)
    prim_d: jnp.ndarray          # (P,)
    prim_U: jnp.ndarray          # (P,3)
    prim_V: jnp.ndarray          # (P,3)
    prim_cu: jnp.ndarray         # (P,)
    prim_cv: jnp.ndarray         # (P,)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Hashable static render configuration (jit static argument)."""
    w: int
    h: int
    focal: float
    max_bounce: int = 8
    num_shadow_ray: int = 1
    use_rr: bool = True
    rr_threshold: float = 0.1
    rr_bounce_th: int = 4
    use_mis: bool = True
    anti_alias: bool = True
    stratified_sampling: bool = True
    brdf_two_sides: bool = False
    has_v_normal: bool = False
    # crop window (start_x, end_x, start_y, end_y) in reference convention
    start_x: int = 0
    end_x: int = 0
    start_y: int = 0
    end_y: int = 0
    # which material/emitter kinds are present (prunes dead branches at trace)
    brdf_types: tuple = ()
    bsdf_types: tuple = ()
    emitter_kinds: tuple = ()
    n_emitters: int = 0
    world_scattering: bool = False
    medium_kinds: tuple = ()        # MediumTags present (world + objects)
    has_null_bsdf: bool = False     # any null (medium-boundary) surface
    n_null_objs: int = 0            # count (sizes the K-hit track slots)
    volume_kind: int = 0            # VolumeTag (0 = no grid volume)
    volume_phase: int = 0           # MediumTag of the volume's phase fn
    use_bvh: bool = False           # BVH traversal vs brute-force scan
    use_pallas: bool = False        # Pallas VMEM-resident triangle kernel
    use_cluster: bool = False       # Pallas two-level cluster intersector
    has_normal_map: bool = False
    has_bump_map: bool = False
    # SSAO (reference renderer/ssao.py:36-38)
    smp_hemisphere: int = 32
    depth_samples: int = 64
    sample_extent: float = 0.1
    # BDPT strategy ranges (reference bdpt.py / cbox.xml sensor block)
    start_t: int = 1
    end_t: int = 100
    start_s: int = 0
    end_s: int = 100
    # transient rendering (reference bdpt.py:40-47,95-108)
    decomposition: str = "none"     # none | transient_cam | transient_lit
    # TRUE camera-unwarped binning (subtract the camera first-leg time):
    # the reference DECLARES transient_lit and coerces it to transient_cam
    # (bdpt.py:42-46, "buggy"); parity keeps that coercion by default and
    # this opt-in (render.py --true_unwarped) does what the reference
    # could not
    unwarp: bool = False
    t_bins: int = 0                 # number of time bins
    t_min: float = 0.0
    t_interval: float = 1.0
    sol: float = 1.0                # world speed of light (world.py:47)
    # AMCW time-of-flight modulation of BDPT connections (reference
    # bdpt.py:28,407-408 — a compile-time option shipped off; here a
    # static config flag, set via dataclasses.replace like the reference
    # edits its constant)
    modulated: bool = False

    @property
    def transient(self) -> bool:
        return self.decomposition != "none" and self.t_bins > 0

    @property
    def n_pixels(self) -> int:
        return self.w * self.h


def _medium_table(mediums) -> MediumTable:
    """Stack MediumRec host records into a MediumTable."""
    def f(attr):
        return jnp.asarray(np.stack([np.asarray(getattr(m, attr),
                                                np.float32) for m in mediums]))
    kind = jnp.asarray(np.array([m.type_id for m in mediums], np.int32))
    ior = jnp.asarray(np.array([m.ior for m in mediums], np.float32))
    return MediumTable(kind=kind, ior=ior, u_a=f("u_a"), u_s=f("u_s"),
                       u_e=f("u_e"), ph_par=f("par"), ph_pdf=f("pdf"))


def _texture_table(objects, recs, atlas) -> TextureTable:
    """Build one tag's per-object texture table from host records."""
    n = len(objects)
    mode = np.full(n, -255, np.int32)
    off_x = np.zeros(n, np.int32)
    off_y = np.zeros(n, np.int32)
    w = np.zeros(n, np.float32)
    h = np.zeros(n, np.float32)
    su = np.ones(n, np.float32)
    sv = np.ones(n, np.float32)
    c1 = np.zeros((n, 3), np.float32)
    c2 = np.zeros((n, 3), np.float32)
    for i, rec in enumerate(recs):
        if rec is None:
            continue
        mode[i] = rec.mode
        off_x[i], off_y[i] = rec.off_x, rec.off_y
        w[i], h[i] = rec.w, rec.h
        su[i], sv[i] = rec.scale_u, rec.scale_v
        c1[i], c2[i] = rec.c1, rec.c2
    if atlas is None:
        atlas = np.zeros((1, 1, 3), np.float32)
    return TextureTable(mode=jnp.asarray(mode), off_x=jnp.asarray(off_x),
                        off_y=jnp.asarray(off_y), w=jnp.asarray(w),
                        h=jnp.asarray(h), scale_u=jnp.asarray(su),
                        scale_v=jnp.asarray(sv), c1=jnp.asarray(c1),
                        c2=jnp.asarray(c2), atlas=jnp.asarray(atlas),
                        present=bool((mode > -255).any()))


def _cluster_cut(node_pack, rows18, prim_aabb):
    """Cut the skip-offset SAH tree into disjoint subtree clusters.

    Each cluster is a whole subtree with <= CM prims; because the builder
    stores prims leaf-contiguous in DFS order, every subtree covers a
    contiguous prim range, so a cluster is just (aabb, row slice). Rows are
    padded to the fixed CM block size (pad rows carry gid = -1) so the
    Pallas intersector can stream one cluster with one DMA. Each cluster
    also gets per-128-prim-chunk AABBs (chunks are contiguous DFS runs, so
    they are tight sub-subtree boxes) for the kernel's second culling
    level; prim_aabb is (P,6) lo|hi per prim in the same DFS order.

    Returns (cl_aabb (C,8), cl_aabb_t (8,Cp), cl_rows (C,24,CM),
    cl_chunk (C*8,K))."""
    M = node_pack.shape[0]
    P = rows18.shape[0]
    base = node_pack[:, 6].astype(np.int64)
    cnt = node_pack[:, 7].astype(np.int64)
    skip = node_pack[:, 8].astype(np.int64)
    # CM=256 measured best end-to-end on the 290k knot with the shortlist
    # sweep + cluster-id ray sort (full 12-bounce render: CM256 2.87,
    # CM512 3.83, CM1024 3.69, CM128 3.75 s/spp); pre-shortlist, CM=1024
    # won (tighter lists changed the optimum). 2048/4096 stay dead: loose
    # boxes defeat the front-to-back prune (bounce closest 1922 vs 515
    # ms). The ADAPT_CM env knob re-runs the experiment without a code
    # edit.
    import os
    cm = int(os.environ.get("ADAPT_CM", "256"))
    if not (cm > 0 and cm % 128 == 0):
        raise ValueError(
            f"ADAPT_CM must be a positive multiple of 128, got {cm}")

    # first leaf prim at-or-after each node (leaf bases increase in DFS)
    big = np.int64(1) << 60
    tmp = np.where(cnt > 0, base, big)
    nxt = np.minimum.accumulate(tmp[::-1])[::-1]
    nxt = np.append(np.where(nxt >= big, P, nxt), P)

    clusters = []
    i = 0
    while i < M:
        s = int(nxt[i])
        e = int(nxt[min(int(skip[i]), M)])
        n = e - s
        if n <= cm or cnt[i] > 0:
            clusters.append((s, n, node_pack[i, 0:6]))
            i = int(skip[i])
        else:
            i += 1
    C = len(clusters)
    K = cm // 128
    Cp = -(-C // 128) * 128
    aabb = np.zeros((C, 8), np.float32)
    aabb_t = np.zeros((8, Cp), np.float32)
    aabb_t[0:3, :] = np.float32(3e38)          # pad clusters never hit
    aabb_t[3:6, :] = np.float32(-3e38)
    # (C, 24, CM): fields on sublanes, prims on lanes (128-aligned DMA
    # slices; see ops/cluster_pallas.py layout note)
    rows = np.zeros((C, 24, cm), np.float32)
    rows[:, 13, :] = -1.0                      # gid row: mark padding
    chunk = np.zeros((C, 8, K), np.float32)
    chunk[:, 0:3, :] = np.float32(3e38)        # empty chunks never hit
    chunk[:, 3:6, :] = np.float32(-3e38)
    for k, (s, n, box) in enumerate(clusters):
        aabb[k, :6] = box
        aabb_t[0:6, k] = box
        rows[k, :18, :n] = rows18[s:s + n].T
        for q in range(-(-n // 128)):
            sl = prim_aabb[s + q * 128:s + min(n, (q + 1) * 128)]
            chunk[k, 0:3, q] = sl[:, 0:3].min(0)
            chunk[k, 3:6, q] = sl[:, 3:6].max(0)
    return aabb, aabb_t, rows, chunk.reshape(C * 8, K)


def _stack3(vals):
    """np.stack that tolerates an empty list (emitter-less scenes are
    legal: sample_light_index returns valid=False for n_emitters == 0)."""
    if not vals:
        return np.zeros((0, 3), np.float32)
    return np.stack(vals).astype(np.float32)


def compile_scene(emitters, array_info, objects, configs, scene_dir="."):
    """Assemble (SceneData, RenderConfig) from parsed host structures."""
    from ..ops.volume_ops import compile_volume, dummy_volume
    from .volume import GridVolumeRec

    vol_nodes = configs.get("volume") or []
    vol_rec = GridVolumeRec(vol_nodes[0] if vol_nodes else None, scene_dir)
    vol_data = compile_volume(vol_rec) if vol_rec.type_id else dummy_volume()
    prims = array_info["primitives"]            # (P,3,3)
    n_g = array_info["n_g"]
    n_s = array_info["n_s"]
    uvs = array_info["uvs"]
    sphere_ids = array_info["indices"]
    sphere_set = set(sphere_ids.tolist()) if sphere_ids is not None else set()
    P = prims.shape[0]

    # global prim -> object map
    prim_obj = np.zeros(P, np.int32)
    obj_start = np.zeros(len(objects), np.int32)
    obj_cnt = np.zeros(len(objects), np.int32)
    obj_is_sphere = np.zeros(len(objects), np.int32)
    acc = 0
    for i, obj in enumerate(objects):
        obj_start[i] = acc
        obj_cnt[i] = obj.tri_num
        obj_is_sphere[i] = int(obj.type == SPHERE)
        prim_obj[acc:acc + obj.tri_num] = i
        acc += obj.tri_num

    sph_ids = (np.unique(sphere_ids.astype(np.int64))
               if sphere_ids is not None and len(sphere_ids)
               else np.zeros(0, np.int64))
    tri_mask = np.ones(P, bool)
    tri_mask[sph_ids] = False
    tri_ids = np.nonzero(tri_mask)[0].astype(np.int64)

    # --- triangle matmul-intersector precompute ---
    tv = prims[tri_ids]                          # (T,3,3)
    p0, e1, e2 = tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]
    m = np.cross(e1, e2)                         # unnormalized normal
    m2 = np.maximum((m * m).sum(-1, keepdims=True), 1e-20)
    n_unit = m / np.sqrt(m2)
    U = np.cross(e2, m) / m2
    V = np.cross(m, e1) / m2

    # --- reference-layout precomputed edge vectors (pre0/1/2) ---
    pre0 = prims[:, 1] - prims[:, 0]
    pre1 = prims[:, 2] - prims[:, 0]
    pre2 = prims[:, 0].copy()
    if sph_ids.size:
        pre0[sph_ids] = prims[sph_ids, 0]        # center
        pre1[sph_ids] = prims[sph_ids, 1]        # radius row
        pre2[sph_ids] = 0.0

    # --- full-length per-prim triangle test data (BVH leaf tests) ---
    prim_is_sphere = np.zeros(P, bool)
    prim_is_sphere[sph_ids] = True
    prim_n = np.zeros((P, 3), np.float32)
    prim_d = np.zeros(P, np.float32)
    prim_U = np.zeros((P, 3), np.float32)
    prim_V = np.zeros((P, 3), np.float32)
    prim_cu = np.zeros(P, np.float32)
    prim_cv = np.zeros(P, np.float32)
    prim_n[tri_ids] = n_unit
    prim_d[tri_ids] = (n_unit * p0).sum(-1)
    prim_U[tri_ids] = U
    prim_V[tri_ids] = V
    prim_cu[tri_ids] = (U * p0).sum(-1)
    prim_cv[tri_ids] = (V * p0).sum(-1)

    # --- BVH over all prims (native binned-SAH; skipped for tiny scenes
    # where the brute-force wavefront scan is faster) ---
    BVH_THRESHOLD = 64
    use_bvh = P >= BVH_THRESHOLD
    if use_bvh:
        from ..native import bvh_build
        prim_lo = prims.min(axis=1)
        prim_hi = prims.max(axis=1)
        if sph_ids.size:
            c = prims[sph_ids, 0]
            r = prims[sph_ids, 1, :1]
            prim_lo[sph_ids] = c - r
            prim_hi[sph_ids] = c + r
        node_f, node_i, prim_order = bvh_build(
            np.concatenate([prim_lo, prim_hi], axis=1).astype(np.float32))
        # int fields ride float32 rows (one packed table, one DMA layout);
        # exact only below 2^24 — fail loudly instead of rounding skip
        # offsets on >16.7M-prim scenes
        if P >= (1 << 24) or node_i.max() >= (1 << 24):
            raise ValueError(
                f"scene too large for the f32-packed BVH rows: P={P}, "
                f"max node field {int(node_i.max())} (>= 2^24)")
        node_pack = np.concatenate(
            [node_f.astype(np.float32), node_i.astype(np.float32)], axis=1)
        a = prim_n.copy()
        b = prim_d.copy()
        if sph_ids.size:
            a[sph_ids] = prims[sph_ids, 0]           # sphere center
            b[sph_ids] = prims[sph_ids, 1, 0]        # sphere radius
        prim_pack = np.concatenate(
            [a, b[:, None], prim_U, prim_cu[:, None], prim_V,
             prim_cv[:, None], prim_is_sphere[:, None].astype(np.float32),
             np.arange(P, dtype=np.float32)[:, None]], axis=1)
        rows18 = np.concatenate(
            [prim_pack, n_g.astype(np.float32),
             prim_obj[:, None].astype(np.float32)], axis=1)
        prim_ab = np.concatenate([prim_lo, prim_hi],
                                 axis=1).astype(np.float32)[prim_order]
        cl_aabb, cl_aabb_t, cl_rows, cl_chunk = _cluster_cut(
            node_pack, rows18[prim_order], prim_ab)
        bvh = dict(bvh_node_pack=jnp.asarray(node_pack),
                   bvh_prim_pack=jnp.asarray(prim_pack[prim_order]),
                   cl_aabb=jnp.asarray(cl_aabb),
                   cl_aabb_t=jnp.asarray(cl_aabb_t),
                   cl_rows=jnp.asarray(cl_rows),
                   cl_chunk=jnp.asarray(cl_chunk),
                   cl_rows_pm=jnp.asarray(
                       np.ascontiguousarray(
                           cl_rows.transpose(0, 2, 1).reshape(-1, 24))))
    else:
        # Placeholders follow the same inverted-box convention as
        # _cluster_cut padding (lo=+3e38 > hi=-3e38 never passes a slab
        # test) so an accidental cluster dispatch on a sceneless config
        # cannot produce phantom hits at the origin.
        inv_box8 = np.zeros((1, 8), np.float32)
        inv_box8[:, 0:3], inv_box8[:, 3:6] = 3e38, -3e38
        inv_aabb_t = np.zeros((8, 128), np.float32)
        inv_aabb_t[0:3, :], inv_aabb_t[3:6, :] = 3e38, -3e38
        inv_chunk = np.zeros((8, 1), np.float32)
        inv_chunk[0:3, :], inv_chunk[3:6, :] = 3e38, -3e38
        empty_rows = np.zeros((1, 24, 128), np.float32)
        empty_rows[:, 13, :] = -1.0            # gid row: mark padding
        # placeholder node: inverted box with skip=1 — an accidental
        # traverse() on an unbuilt BVH misses and TERMINATES (skip=0 made
        # the cursor walk spin forever on a box miss)
        inv_node = np.zeros((1, 9), np.float32)
        inv_node[:, 0:3], inv_node[:, 3:6] = 3e38, -3e38
        inv_node[:, 8] = 1.0
        bvh = dict(bvh_node_pack=jnp.asarray(inv_node),
                   bvh_prim_pack=jnp.zeros((1, 14), jnp.float32),
                   cl_aabb=jnp.asarray(inv_box8),
                   cl_aabb_t=jnp.asarray(inv_aabb_t),
                   cl_rows=jnp.asarray(empty_rows),
                   cl_chunk=jnp.asarray(inv_chunk),
                   cl_rows_pm=jnp.asarray(
                       empty_rows.transpose(0, 2, 1).reshape(-1, 24)))

    # --- camera ---
    cam_dir = configs["transform"][0]
    if cam_dir is None or np.ndim(cam_dir) != 1 or np.size(cam_dir) != 3:
        raise ValueError(
            "the <sensor> transform must be a <lookat> (rotate/translate-"
            "only sensor transforms have no view direction); got "
            f"{type(cam_dir).__name__} from the scene XML")
    cam_orient = np.asarray(cam_dir).astype(np.float32)
    cam_orient /= np.linalg.norm(cam_orient)
    cam_t = configs["transform"][1].astype(np.float32)
    cam_r = np_rotation_between(np.float32([0, 0, 1]), cam_orient)

    film = configs["film"]
    w, h = film["width"], film["height"]
    crop_x, crop_y = film.get("crop_x", 0), film.get("crop_y", 0)
    crop_rx, crop_ry = film.get("crop_rx", 0), film.get("crop_ry", 0)
    do_crop = crop_rx > 0 and crop_ry > 0
    if do_crop:
        sx, ex = crop_x - crop_rx, crop_x + crop_rx
        sy, ey = crop_y - crop_ry, crop_y + crop_ry
    else:
        sx, ex, sy, ey = 0, w, 0, h

    world = configs["world"]
    mats = [obj.bxdf for obj in objects]

    # --- BxDF mixtures (reference bxdf/mixture.py, `more`-branch feature):
    # component records are appended as extra rows after the O per-object
    # rows in every table gather_mat packs, so mixture_ops can delegate to
    # them with the ordinary per-row material gather. obj_mixture maps an
    # object row to its mixture-table row (-1 = plain material). ---
    from .bxdf import Mixture_np
    mix_list, mix_index = [], {}
    for m in mats:
        if isinstance(m, Mixture_np) and id(m) not in mix_index:
            mix_index[id(m)] = len(mix_list)
            mix_list.append(m)
    pad_mats = list(mats)
    row_of = {id(m): i for i, m in enumerate(mats) if not
              isinstance(m, Mixture_np)}
    for mx in mix_list:
        for comp in mx.components.values():
            if id(comp) not in row_of:
                row_of[id(comp)] = len(pad_mats)
                pad_mats.append(comp)
    obj_mixture = np.full(len(pad_mats), -1, np.int32)
    for i, m in enumerate(mats):
        if isinstance(m, Mixture_np):
            obj_mixture[i] = mix_index[id(m)]
    if mix_list:
        from ..ops.mixture_ops import MixtureTable, N_COMPONENTS
        from .bxdf import MIXTURE_SLOTS
        comp_ids = np.full((len(mix_list), N_COMPONENTS), -1, np.int32)
        probs = np.zeros((len(mix_list), N_COMPONENTS), np.float32)
        for mi, mx in enumerate(mix_list):
            probs[mi] = mx.probs
            for slot, comp in mx.components.items():
                comp_ids[mi, MIXTURE_SLOTS.index(slot)] = row_of[id(comp)]
        mixture_table = MixtureTable(comp_ids=jnp.asarray(comp_ids),
                                     probs=jnp.asarray(probs))
    else:
        mixture_table = None
    # dispatch tables cover component kinds; the MIXTURE tag itself never
    # enters brdf_types (mixture lanes are overlaid, not table-dispatched)
    disp_mats = [m for m in pad_mats if not isinstance(m, Mixture_np)]

    cfg = RenderConfig(
        w=w, h=h, focal=fov2focal(configs["fov"], min(w, h)),
        max_bounce=configs.get("max_bounce", 8),
        num_shadow_ray=configs.get("num_shadow_ray", 1),
        use_rr=bool(configs.get("use_rr", True)),
        rr_threshold=float(configs.get("rr_threshold", 0.1)),
        rr_bounce_th=int(configs.get("rr_bounce_th", 4)),
        use_mis=bool(configs.get("use_mis", True)),
        anti_alias=bool(configs.get("anti_alias", True)),
        stratified_sampling=bool(configs.get("stratified_sampling", True)),
        brdf_two_sides=bool(configs.get("brdf_two_sides", False)),
        has_v_normal=bool(configs.get("has_vertex_normal", False)),
        start_x=sx, end_x=ex, start_y=sy, end_y=ey,
        brdf_types=tuple(sorted({m.type_id for m in disp_mats
                                 if not m.is_bsdf})),
        bsdf_types=tuple(sorted({m.type_id for m in disp_mats
                                 if m.is_bsdf})),
        emitter_kinds=tuple(sorted({e.kind for e in emitters})),
        n_emitters=len(emitters),
        world_scattering=world.medium.is_scattering,
        medium_kinds=tuple(sorted(
            {m.medium.type_id for m in pad_mats if m.medium.type_id >= 0}
            | ({world.medium.type_id} if world.medium.is_scattering
               else set()))),
        has_null_bsdf=any(m.is_bsdf and m.type_id < 0 for m in pad_mats),
        n_null_objs=sum(1 for m in pad_mats
                        if m.is_bsdf and m.type_id < 0),
        volume_kind=int(vol_rec.type_id),
        volume_phase=int(vol_rec.phase_type_id),
        use_bvh=use_bvh,
        # Pallas triangle kernel: small scenes on a real TPU (Mosaic);
        # CPU tests opt in via interpret mode.
        use_pallas=(len(tri_ids) > 0 and len(tri_ids) <= 256 and P <= 256
                    and jax.default_backend() != "cpu"),
        # Pallas cluster intersector: big scenes on TPU (the jnp cursor
        # walk's per-lane gathers measure ~100x off HBM bandwidth there)
        use_cluster=(P > 256 and jax.default_backend() != "cpu"),
        has_normal_map=any(obj.texture_group.get("normal") is not None
                           for obj in objects),
        has_bump_map=any(obj.texture_group.get("bump") is not None
                         for obj in objects),
        smp_hemisphere=int(configs.get("smp_hemisphere", 32)),
        depth_samples=int(configs.get("depth_samples", 64)),
        sample_extent=float(configs.get("sample_extent", 0.1)),
        start_t=int(configs.get("start_t", 1)),
        end_t=int(configs.get("end_t", 100)),
        start_s=int(configs.get("start_s", 0)),
        end_s=int(configs.get("end_s", 100)),
        decomposition=str(configs.get("decomposition", "none")),
        t_bins=int(configs.get("sample_count", 0))
        if "decomposition" in configs else 0,
        t_min=float(configs.get("min_time", 0.0)),
        t_interval=float(configs.get("interval", 1.0)),
        sol=float(world.C),
    )

    aabbs = np.stack([obj.aabb for obj in objects])  # (O,2,3)

    tex_tables = {}
    packed = configs.get("packed_textures") or {}
    for tag in ("albedo", "normal", "bump", "roughness"):
        recs = [obj.texture_group.get(tag) for obj in objects]
        atlas = packed.get(tag)
        tex_tables[tag] = _texture_table(objects, recs, atlas)

    scene = SceneData(
        tri_gid=jnp.asarray(tri_ids.astype(np.int32)),
        tri_obj=jnp.asarray(prim_obj[tri_ids]),
        tri_n=jnp.asarray(n_unit.astype(np.float32)),
        # same arrays as prim_d/prim_cu/prim_cv: the tiers must stay
        # op-identical for the cross-tier exactness tests
        tri_d=jnp.asarray(prim_d[tri_ids].astype(np.float32)),
        tri_U=jnp.asarray(U.astype(np.float32)),
        tri_V=jnp.asarray(V.astype(np.float32)),
        tri_cu=jnp.asarray(prim_cu[tri_ids].astype(np.float32)),
        tri_cv=jnp.asarray(prim_cv[tri_ids].astype(np.float32)),
        sph_gid=jnp.asarray(sph_ids.astype(np.int32)),
        sph_obj=jnp.asarray(prim_obj[sph_ids] if sph_ids.size
                            else np.zeros(0, np.int32)),
        sph_center=jnp.asarray(prims[sph_ids, 0] if sph_ids.size
                               else np.zeros((0, 3), np.float32)),
        sph_radius=jnp.asarray(prims[sph_ids, 1, 0] if sph_ids.size
                               else np.zeros(0, np.float32)),
        prim_ng=jnp.asarray(n_g),
        prim_vn=jnp.asarray(n_s),
        prim_uv=jnp.asarray(uvs),
        pre0=jnp.asarray(pre0.astype(np.float32)),
        pre1=jnp.asarray(pre1.astype(np.float32)),
        pre2=jnp.asarray(pre2.astype(np.float32)),
        obj_start=jnp.asarray(obj_start),
        obj_cnt=jnp.asarray(obj_cnt),
        obj_is_sphere=jnp.asarray(obj_is_sphere),
        obj_emitter=jnp.asarray(np.array(
            [obj.emitter_ref_id for obj in objects]
            + [-1] * (len(pad_mats) - len(mats)), np.int32)),
        obj_aabb_min=jnp.asarray(aabbs[:, 0]),
        obj_aabb_max=jnp.asarray(aabbs[:, 1]),
        mat_type=jnp.asarray(np.array([m.type_id for m in pad_mats],
                                      np.int32)),
        mat_is_bsdf=jnp.asarray(np.array([m.is_bsdf for m in pad_mats],
                                         bool)),
        mat_is_delta=jnp.asarray(np.array([m.is_delta for m in pad_mats],
                                          bool)),
        mat_kd=jnp.asarray(np.stack([m.k_d for m in pad_mats])
                           .astype(np.float32)),
        mat_ks=jnp.asarray(np.stack([m.k_s for m in pad_mats])
                           .astype(np.float32)),
        mat_kg=jnp.asarray(np.stack([m.k_g for m in pad_mats])
                           .astype(np.float32)),
        mat_mean=jnp.asarray(np.stack([m.mean for m in pad_mats])),
        medium=_medium_table([m.medium for m in pad_mats]),
        mixture=mixture_table,
        obj_mixture=jnp.asarray(obj_mixture),
        emit_kind=jnp.asarray(np.array([e.kind for e in emitters], np.int32)),
        emit_intensity=jnp.asarray(_stack3([e.intensity for e in emitters])),
        emit_pos=jnp.asarray(_stack3([e.pos for e in emitters])),
        emit_dir=jnp.asarray(_stack3([e.dir for e in emitters])),
        emit_inv_area=jnp.asarray(
            np.array([e.inv_area for e in emitters], np.float32)),
        emit_r=jnp.asarray(np.array([e.r for e in emitters], np.float32)),
        emit_bits=jnp.asarray(np.array([e.bool_bits for e in emitters],
                                       np.int32)),
        emit_obj=jnp.asarray(_emitter_obj_refs(emitters, objects)),
        emit_time=jnp.asarray(np.array([e.emit_time for e in emitters],
                                       np.float32)),
        sky=jnp.asarray(world.skybox),
        ambient=jnp.asarray(world.ambient),
        world_medium=_medium_table([world.medium]),
        cam_r=jnp.asarray(cam_r),
        cam_t=jnp.asarray(cam_t),
        tex=tex_tables,
        volume=vol_data,
        prim_obj=jnp.asarray(prim_obj),
        prim_is_sphere=jnp.asarray(prim_is_sphere),
        prim_n=jnp.asarray(prim_n),
        prim_d=jnp.asarray(prim_d),
        prim_U=jnp.asarray(prim_U),
        prim_V=jnp.asarray(prim_V),
        prim_cu=jnp.asarray(prim_cu),
        prim_cv=jnp.asarray(prim_cv),
        **bvh,
    )
    return scene, cfg


def _emitter_obj_refs(emitters, objects) -> np.ndarray:
    """Emitter -> attached-object back references
    (reference path_tracer.py:245-274)."""
    refs = np.full(len(emitters), -1, np.int32)
    for i, obj in enumerate(objects):
        if obj.emitter_ref_id >= 0:
            refs[obj.emitter_ref_id] = i
    return refs


def load_scene(directory: str, file: str):
    """Parse + compile a scene in one call."""
    from ..parsers.xml_parser import scene_parsing
    emitters, array_info, objects, configs = scene_parsing(directory, file)
    scene, cfg = compile_scene(emitters, array_info, objects, configs,
                               scene_dir=directory)
    return scene, cfg, configs
