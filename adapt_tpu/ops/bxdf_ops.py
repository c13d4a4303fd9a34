"""Vectorized BxDF evaluation / sampling / pdf (device side).

The reference dispatches per-ray through Taichi struct methods with dynamic
branches (bxdf/brdf.py:503-601, bxdf/bsdf.py:242-262). Here each material
model is a branchless batched function over the whole ray wavefront; the
dispatcher computes only the models *present in the scene* (statically known
from RenderConfig.brdf_types/bsdf_types) and blends with masks. All eval
functions return cosine-weighted BxDF values, mirroring the reference.

Conventions (same as reference):
  incid : ray direction pointing INTO the surface (camera->surface)
  out   : scattered direction pointing AWAY from the surface
  n_s/n_g : shading / geometric normals
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constants import BRDFTag, BSDFTag, INV_PI, TRANSPORT_RAD, TRANSPORT_UNI
from .math3d import (dot, normalize, convert_to_raw,
                     delocalize_rotate, localize_rotate)
from .geo_optics import (inci_reflect_dir, schlick_fresnel, fresnel_equation,
                         snell_refraction, refraction_cos2, fresnel_eval)
from .sampling import (cosine_hemisphere, mod_phong_hemisphere,
                       fresnel_hemisphere)

EPS = 1e-7


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass
class MatParams:
    """Per-ray gathered material parameters."""
    kind: jnp.ndarray      # (N,) i32 BRDFTag / BSDFTag
    is_bsdf: jnp.ndarray   # (N,) bool
    is_delta: jnp.ndarray  # (N,) bool
    kd: jnp.ndarray        # (N,3)
    ks: jnp.ndarray        # (N,3)
    kg: jnp.ndarray        # (N,3)
    mean: jnp.ndarray      # (N,3)
    ior: jnp.ndarray       # (N,) attached-medium ior (BSDF only)
    emit: jnp.ndarray      # (N,) i32 attached emitter id (-1 = none)


def gather_mat(scene, obj_id) -> MatParams:
    """Gather per-object material tables by (clamped) object id.

    One shared one-hot contraction over all 9 tables (incl. the attached
    emitter id, so integrators get hit_light for free)."""
    from .gather import tgather_pack
    idx = jnp.maximum(obj_id, 0)
    kind, is_bsdf, is_delta, kd, ks, kg, mean, ior, emit = tgather_pack(
        [scene.mat_type, scene.mat_is_bsdf, scene.mat_is_delta,
         scene.mat_kd, scene.mat_ks, scene.mat_kg, scene.mat_mean,
         scene.medium.ior, scene.obj_emitter], idx)
    return MatParams(kind=kind, is_bsdf=is_bsdf, is_delta=is_delta,
                     kd=kd, ks=ks, kg=kg, mean=mean, ior=ior, emit=emit)


def diffuse_color(mat, it):
    """Texture override of k_d (reference brdf.py:181 et al.).

    it.tex is None — STATICALLY — when the scene has no albedo textures
    (ops/intersect.py _assemble_interaction): the select below then
    vanishes from the graph and, more importantly, the tex plane never
    enters the PT bounce-loop carry. Carrying even a dead constant plane
    there measurably breaks XLA fusion (r2's 31% flagship regression)."""
    if it.tex is None:
        return mat.kd
    tex_valid = it.tex[..., 0] >= 0.0
    return jnp.where(tex_valid[..., None], it.tex, mat.kd)


# ======================= BRDF evals (cosine-weighted) =======================

def eval_lambertian(mat, it, normal, out):
    cos_t = jnp.maximum(0.0, dot(normal, out))
    return diffuse_color(mat, it) * INV_PI * cos_t[..., None]


def eval_blinn_phong(mat, it, incid, out):
    half = out - incid
    degenerate = jnp.max(jnp.abs(half), axis=-1) <= EPS
    half = jnp.where(degenerate[..., None], 0.0, normalize(half))
    dot_clamp = jnp.maximum(0.0, dot(half, it.n_s))
    glossy = jnp.power(dot_clamp[..., None], mat.kg)
    cos_t = jnp.maximum(0.0, dot(it.n_s, out))
    return (diffuse_color(mat, it)
            + mat.ks * (0.5 * (mat.kg + 2.0) * glossy)) \
        * INV_PI * cos_t[..., None]


def eval_mod_phong(mat, it, incid, out):
    dot_normal = dot(it.n_s, out)
    reflect_d = normalize(2.0 * it.n_s * dot_normal[..., None] - out)
    dot_view = jnp.maximum(0.0, -dot(incid, reflect_d))
    glossy = jnp.power(dot_view[..., None], mat.kg) * mat.ks
    spec = 0.5 * (mat.kg + 2.0) * glossy * INV_PI * dot_normal[..., None]
    spec = spec + eval_lambertian(mat, it, it.n_s, out)
    return jnp.where((dot_normal > 0.0)[..., None], spec, 0.0)


def _fresnel_cos2_sin2(half_vec, normal, dot_half):
    """Azimuth (cos^2, sin^2) of the half vector in the tangent frame
    (reference brdf.py:247-250)."""
    x_axis = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], half_vec.dtype),
                              half_vec.shape)
    transed_x = delocalize_rotate(normal, x_axis)   # R @ [1,0,0]
    proj = normalize(half_vec - dot_half[..., None] * normal)
    cos_phi2 = dot(transed_x, proj) ** 2
    return cos_phi2, 1.0 - cos_phi2


def eval_fresnel_blend(mat, it, incid, out):
    """Ashikhmin-Shirley anisotropic Fresnel blend (brdf.py:253-275).
    kg = (n_u, n_v, precomputed sqrt((nu+1)(nv+1))/8pi)."""
    half_vec = out - incid
    dot_out = dot(it.n_s, out)
    ok = (dot_out > 0.0) & (jnp.max(jnp.abs(half_vec), axis=-1) > 1e-4)
    half_vec = normalize(half_vec)
    dot_in = -dot(it.n_s, incid)
    dot_half = jnp.abs(dot(it.n_s, half_vec))
    dot_hk = jnp.abs(dot(half_vec, out))
    fresnel = schlick_fresnel(mat.ks, dot_hk)
    cos_phi2, sin_phi2 = _fresnel_cos2_sin2(half_vec, it.n_s, dot_half)
    denom = jnp.maximum(dot_hk * jnp.maximum(dot_in, dot_out), 1e-9)
    specular = mat.kg[..., 2:3] * jnp.power(
        dot_half[..., None],
        (mat.kg[..., 0] * cos_phi2 + mat.kg[..., 1] * sin_phi2)[..., None]) \
        * fresnel / denom[..., None]
    diffuse = 28.0 / (23.0 * jnp.pi) * diffuse_color(mat, it) * (1.0 - mat.ks)
    pow5_in = jnp.power(1.0 - dot_in / 2.0, 5.0)
    pow5_out = jnp.power(1.0 - dot_out / 2.0, 5.0)
    diffuse = diffuse * ((1.0 - pow5_in) * (1.0 - pow5_out))[..., None]
    spec = (specular + diffuse) * dot_out[..., None]
    return jnp.where(ok[..., None], spec, 0.0)


def eval_oren_nayar(mat, it, incid, out):
    """Oren-Nayar diffuse; kg = (A, B, thin-coat ior) (brdf.py:313-342)."""
    raw_wi = convert_to_raw(-incid, it.n_s)
    raw_wo = convert_to_raw(out, it.n_s)
    sin_i, sin_o = raw_wi[..., 1], raw_wo[..., 1]
    both = (sin_i > 1e-5) & (sin_o > 1e-5)
    d_cos = raw_wi[..., 2] * raw_wo[..., 2] + raw_wi[..., 3] * raw_wo[..., 3]
    max_cos = jnp.where(both, jnp.maximum(0.0, d_cos), 0.0)
    abs_ci, abs_co = jnp.abs(raw_wi[..., 0]), jnp.abs(raw_wo[..., 0])
    i_bigger = abs_ci > abs_co
    sin_alpha = jnp.where(i_bigger, sin_o, sin_i)
    tan_beta = jnp.where(i_bigger, sin_i / jnp.maximum(abs_ci, 1e-9),
                         sin_o / jnp.maximum(abs_co, 1e-9))
    factor = mat.kg[..., 0] + mat.kg[..., 1] * max_cos * sin_alpha * tan_beta
    return diffuse_color(mat, it) * INV_PI * (factor * abs_co)[..., None]


def eval_thin_coat(mat, it, incid, out):
    """Fresnel-coated Oren-Nayar plastic (brdf.py:390-407).
    kg[2] holds the coating IOR."""
    ior = mat.kg[..., 2]
    reflect, _ = inci_reflect_dir(incid, it.n_s)
    dot_in = dot(incid, it.n_s)
    refra_in, cos_r2_in = snell_refraction(incid, it.n_s, dot_in,
                                           jnp.ones_like(ior), ior)
    in_F = fresnel_equation(1.0, ior, jnp.abs(dot_in),
                            jnp.sqrt(jnp.maximum(cos_r2_in, 0.0)))
    is_mirror = jnp.abs(dot(out, reflect)) > (1.0 - 1e-4)
    mirror_spec = mat.ks * in_F[..., None]
    dot_out = dot(out, it.n_s)
    refra_out, cos_r2_out = snell_refraction(out, it.n_s, dot_out,
                                             jnp.ones_like(ior), ior)
    out_F = fresnel_equation(1.0, ior, jnp.abs(dot_out),
                             jnp.sqrt(jnp.maximum(cos_r2_out, 0.0)))
    on = eval_oren_nayar(mat, it, refra_in, refra_out) \
        * (1.0 - jnp.maximum(in_F, out_F))[..., None]
    return jnp.where(is_mirror[..., None], mirror_spec, on)


def _thin_coat_fresnel(mat, it, incid):
    """Incident Fresnel term of the coating (brdf.py:410-422)."""
    ior = mat.kg[..., 2]
    dot_in = dot(incid, it.n_s)
    ratio = 1.0 / ior
    cos_r2 = 1.0 - ratio * ratio * (1.0 - dot_in * dot_in)
    return fresnel_equation(1.0, ior, jnp.abs(dot_in),
                            jnp.sqrt(jnp.maximum(cos_r2, 0.0)))


# ================= GGX / Trowbridge-Reitz microfacet =================
# Anisotropic GGX with Heitz visible-normal sampling. The reference ships
# this behind a compile-time flag that defaults OFF (brdf.py:8, JIT cost) —
# here it is always available. Parameterization follows the reference:
# k_g[0]/k_g[1] = alpha_x/alpha_y (roughness_to_alpha precompute), k_s[0..1]
# = dielectric Fresnel iors (sampler/microfacet.py:28-177, brdf.py:426-499).
# Local frames are y-up (math3d.rotation_from_y convention), matching the
# sampler library.

def _ggx_d(wh_l, ax, ay):
    """GGX normal distribution D in the y-up local frame."""
    cos2 = wh_l[..., 1] * wh_l[..., 1]
    e = (wh_l[..., 0] ** 2 / jnp.maximum(ax * ax, 1e-9)
         + wh_l[..., 2] ** 2 / jnp.maximum(ay * ay, 1e-9))
    denom = jnp.pi * ax * ay * (cos2 + e) ** 2
    return jnp.where(cos2 > 1e-12, 1.0 / jnp.maximum(denom, 1e-12), 0.0)


def _ggx_lambda(w_l, ax, ay):
    """Smith masking Lambda (reference trow_reitz_lambda)."""
    cos2 = w_l[..., 1] * w_l[..., 1]
    a2 = (ax * w_l[..., 0]) ** 2 + (ay * w_l[..., 2]) ** 2
    tan2 = a2 / jnp.maximum(cos2, 1e-9)
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + tan2))


def _ggx_g1(w_l, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(w_l, ax, ay))


def _ggx_g(wo_l, wi_l, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(wo_l, ax, ay)
                  + _ggx_lambda(wi_l, ax, ay))


def _ggx_sample_wh(wo_l, ax, ay, u1, u2):
    """Heitz 2018 VNDF sampling in the y-up local frame."""
    vh = normalize(jnp.stack([ax * wo_l[..., 0], wo_l[..., 1],
                              ay * wo_l[..., 2]], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 2] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    T1 = jnp.where((lensq > 1e-9)[..., None],
                   jnp.stack([-vh[..., 2] * inv_len,
                              jnp.zeros_like(inv_len),
                              vh[..., 0] * inv_len], axis=-1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape))
    T2 = jnp.cross(vh, T1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 1])
    t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1 * t1, 0.0)) + s * t2
    nh = (t1[..., None] * T1 + t2[..., None] * T2
          + jnp.sqrt(jnp.maximum(1.0 - t1 * t1 - t2 * t2, 0.0))[..., None]
          * vh)
    wh = jnp.stack([ax * nh[..., 0], jnp.maximum(nh[..., 1], 1e-6),
                    ay * nh[..., 2]], axis=-1)
    return normalize(wh)


def _ggx_local(n_s, v):
    """World -> y-up local frame of n_s."""
    return localize_rotate(n_s, v)


def eval_microfacet(mat, it, incid, out):
    """Cosine-weighted Torrance-Sparrow GGX (reference brdf.py:471-499)."""
    ax = jnp.maximum(mat.kg[..., 0], 1e-4)
    ay = jnp.maximum(mat.kg[..., 1], 1e-4)
    cos_o = dot(it.n_s, out)
    cos_i = dot(it.n_s, incid)
    ok = cos_o * cos_i < 0.0
    wh = normalize(out - incid)
    # keep wh in the upper hemisphere of the local frame
    wh = jnp.where(dot(wh, it.n_s)[..., None] < 0.0, -wh, wh)
    wh_l = _ggx_local(it.n_s, wh)
    wo_l = _ggx_local(it.n_s, -incid)
    wi_l = _ggx_local(it.n_s, out)
    F = fresnel_eval(dot(wh, out), mat.ks[..., 0], mat.ks[..., 1])
    val = (diffuse_color(mat, it) * (_ggx_d(wh_l, ax, ay)
           * _ggx_g(wo_l, wi_l, ax, ay) * F)[..., None]
           / jnp.maximum(4.0 * jnp.abs(cos_i), 1e-9)[..., None])
    return jnp.where(ok[..., None], val, 0.0)


def _ggx_pdf(mat, it, incid, out):
    """Solid-angle pdf of the VNDF sample for incid -> out."""
    ax = jnp.maximum(mat.kg[..., 0], 1e-4)
    ay = jnp.maximum(mat.kg[..., 1], 1e-4)
    wh = normalize(out - incid)
    wh = jnp.where(dot(wh, it.n_s)[..., None] < 0.0, -wh, wh)
    wh_l = _ggx_local(it.n_s, wh)
    wo_l = _ggx_local(it.n_s, -incid)
    wo_l = jnp.where(wo_l[..., 1:2] < 0.0, -wo_l, wo_l)
    dot_wo_wh = jnp.abs(jnp.sum(wo_l * wh_l, -1))
    pdf_vndf = _ggx_g1(wo_l, ax, ay) * _ggx_d(wh_l, ax, ay) * dot_wo_wh \
        / jnp.maximum(jnp.abs(wo_l[..., 1]), 1e-9)
    return pdf_vndf / jnp.maximum(4.0 * dot_wo_wh, 1e-9)


def _sample_microfacet(mat, it, incid, u):
    """VNDF importance sampling (reference brdf.py:430-452)."""
    ax = jnp.maximum(mat.kg[..., 0], 1e-4)
    ay = jnp.maximum(mat.kg[..., 1], 1e-4)
    wo_l = _ggx_local(it.n_s, -incid)
    flip = wo_l[..., 1:2] < 0.0
    wo_l = jnp.where(flip, -wo_l, wo_l)
    wh_l = _ggx_sample_wh(wo_l, ax, ay, u[:, 2], u[:, 3])
    wh = delocalize_rotate(it.n_s, wh_l)
    wh = jnp.where(flip, -wh, wh)
    out, _ = inci_reflect_dir(incid, wh)
    spec = eval_microfacet(mat, it, incid, out)
    dot_wo_wh = jnp.abs(jnp.sum(wo_l * wh_l, -1))
    pdf = _ggx_g1(wo_l, ax, ay) * _ggx_d(wh_l, ax, ay) * dot_wo_wh \
        / jnp.maximum(jnp.abs(wo_l[..., 1]), 1e-9) \
        / jnp.maximum(4.0 * dot_wo_wh, 1e-9)
    bad = dot(out, it.n_s) * dot(incid, it.n_s) >= 0.0
    spec = jnp.where(bad[..., None], 0.0, spec)
    pdf = jnp.where(bad, 1.0, pdf)
    return out, spec, pdf


_BRDF_EVALS = {
    BRDFTag.BLINN_PHONG: lambda m, it, i, o: eval_blinn_phong(m, it, i, o),
    BRDFTag.LAMBERTIAN: lambda m, it, i, o: eval_lambertian(m, it, it.n_s, o),
    BRDFTag.MOD_PHONG: eval_mod_phong,
    BRDFTag.FRESNEL_BLEND: eval_fresnel_blend,
    BRDFTag.OREN_NAYAR: eval_oren_nayar,
    BRDFTag.THIN_COAT: eval_thin_coat,
    BRDFTag.SPECULAR: lambda m, it, i, o: jnp.zeros_like(m.kd),
    BRDFTag.MICROFACET: eval_microfacet,
}


def brdf_eval(cfg, mat, it, incid, out):
    """Unified BRDF eval with hemisphere gate (reference brdf.py:503-526)."""
    same_hemi = dot(incid, it.n_g) * dot(out, it.n_g) < 0.0
    res = jnp.zeros_like(mat.kd)
    for tag in cfg.brdf_types:
        spec = _BRDF_EVALS[tag](mat, it, incid, out)
        res = jnp.where((mat.kind == tag)[..., None], spec, res)
    return jnp.where(same_hemi[..., None], res, 0.0)


# ============================ BRDF sampling ============================

def _sample_lambertian(mat, it, normal, u1, u2):
    local_dir, pdf = cosine_hemisphere(u1, u2)
    out = delocalize_rotate(normal, local_dir)
    return out, eval_lambertian(mat, it, normal, out), pdf


def brdf_sample(cfg, mat, it, incid, u):
    """Unified BRDF sampling; u is (N, 6) uniforms.

    Returns (dir, cosine-weighted throughput, pdf, is_specular); applies the
    geometric-normal leak guard (reference brdf.py:557-559)."""
    N = incid.shape[0]
    out = jnp.tile(jnp.array([0.0, 1.0, 0.0], jnp.float32), (N, 1))
    spec = jnp.ones_like(mat.kd)
    pdf = jnp.ones((N,), jnp.float32)
    is_specular = jnp.zeros((N,), bool)

    lam_dir, lam_spec, lam_pdf = _sample_lambertian(mat, it, it.n_s,
                                                    u[:, 0], u[:, 1])

    for tag in cfg.brdf_types:
        if tag in (BRDFTag.LAMBERTIAN, BRDFTag.OREN_NAYAR):
            t_dir, t_spec, t_pdf, t_delta = lam_dir, lam_spec, lam_pdf, None
            if tag == BRDFTag.OREN_NAYAR:
                t_spec = eval_oren_nayar(mat, it, incid, lam_dir)
        elif tag == BRDFTag.BLINN_PHONG:
            t_dir, t_pdf = lam_dir, lam_pdf
            t_spec = eval_blinn_phong(mat, it, incid, lam_dir)
            t_delta = None
        elif tag == BRDFTag.SPECULAR:
            t_dir, _ = inci_reflect_dir(incid, it.n_s)
            t_spec = diffuse_color(mat, it)
            t_pdf = jnp.ones((N,), jnp.float32)
            t_delta = jnp.ones((N,), bool)
        elif tag == BRDFTag.MOD_PHONG:
            t_dir, t_spec, t_pdf = _sample_mod_phong(mat, it, incid, u,
                                                     lam_dir, lam_spec,
                                                     lam_pdf)
            t_delta = None
        elif tag == BRDFTag.FRESNEL_BLEND:
            t_dir, t_spec, t_pdf = _sample_fresnel_blend(mat, it, incid, u,
                                                         lam_dir)
            t_delta = None
        elif tag == BRDFTag.THIN_COAT:
            t_dir, t_spec, t_pdf, t_delta = _sample_thin_coat(mat, it, incid,
                                                              u)
        else:  # MICROFACET (always enabled, unlike reference brdf.py:8)
            t_dir, t_spec, t_pdf = _sample_microfacet(mat, it, incid, u)
            t_delta = None
        m = (mat.kind == tag) & ~mat.is_bsdf
        out = jnp.where(m[..., None], t_dir, out)
        spec = jnp.where(m[..., None], t_spec, spec)
        pdf = jnp.where(m, t_pdf, pdf)
        if t_delta is not None:
            is_specular = jnp.where(m, t_delta, is_specular)

    # shading-normal leak guard
    leak = dot(out, it.n_g) <= 0.0
    spec = jnp.where(leak[..., None], 0.0, spec)
    return out, spec, pdf, is_specular


def _sample_mod_phong(mat, it, incid, u, lam_dir, lam_spec, lam_pdf):
    """Reference brdf.py:209-229."""
    eps = u[:, 2]
    p_diffuse = jnp.max(diffuse_color(mat, it), axis=-1)
    p_spec = jnp.max(mat.ks, axis=-1)
    # glossy lobe around the reflected view direction
    local_dir, g_pdf = mod_phong_hemisphere(u[:, 3], u[:, 4],
                                            mat.mean[..., 2])
    normal = delocalize_rotate(it.n_s, local_dir)
    g_dir = normalize(-2.0 * normal * dot(incid, normal)[..., None] + incid)
    g_spec = eval_mod_phong(mat, it, incid, g_dir)

    take_diffuse = eps < p_diffuse
    take_glossy = (~take_diffuse) & (eps < p_diffuse + p_spec)
    out = jnp.where(take_diffuse[..., None], lam_dir,
                    jnp.where(take_glossy[..., None], g_dir,
                              jnp.broadcast_to(
                                  jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                  lam_dir.shape)))
    spec = jnp.where(take_diffuse[..., None], lam_spec,
                     jnp.where(take_glossy[..., None], g_spec, 0.0))
    pdf = jnp.where(take_diffuse, p_diffuse * lam_pdf,
                    jnp.where(take_glossy, g_pdf * p_spec,
                              1.0 - p_diffuse - p_spec))
    return out, spec, pdf


def _sample_fresnel_blend(mat, it, incid, u, lam_dir):
    """Reference brdf.py:278-286."""
    local_half, power_coeff = fresnel_hemisphere(u[:, 2], u[:, 3],
                                                 mat.kg[..., 0],
                                                 mat.kg[..., 1])
    half = delocalize_rotate(it.n_s, local_half)
    reflected, dot_incid = inci_reflect_dir(incid, half)
    half_pdf = mat.kg[..., 2] * jnp.power(
        jnp.maximum(dot(half, it.n_s), 0.0), power_coeff)
    spec_pdf = half_pdf / jnp.maximum(jnp.abs(dot_incid), EPS)
    is_valid = dot(it.n_s, reflected) > 0.0
    take_lambert = u[:, 4] > 0.5
    out = jnp.where(take_lambert[..., None], lam_dir, reflected)
    pdf = 0.5 * (spec_pdf + jnp.abs(dot(out, it.n_s)) * INV_PI)
    spec = jnp.where(is_valid[..., None],
                     eval_fresnel_blend(mat, it, incid, out), 0.0)
    return out, spec, pdf


def _sample_thin_coat(mat, it, incid, u):
    """Reference brdf.py:349-387 (including its use of kg[0] in the incident
    Fresnel term — reproduced for output parity)."""
    ior = mat.kg[..., 2]
    dot_normal = dot(incid, it.n_s)
    refra_in, cos_r2 = snell_refraction(incid, it.n_s, dot_normal,
                                        jnp.ones_like(ior), ior)
    in_F = fresnel_equation(1.0, mat.kg[..., 0], jnp.abs(dot_normal),
                            jnp.sqrt(jnp.maximum(cos_r2, 0.0)))
    take_reflect = u[:, 2] <= in_F

    # diffuse branch: cosine-hemisphere + second Fresnel event
    local_dir, lam_pdf = cosine_hemisphere(u[:, 0], u[:, 1])
    d_dir = delocalize_rotate(it.n_s, local_dir)
    dot_out = dot(d_dir, it.n_s)
    cos_r2_out = refraction_cos2(dot_out, ior, jnp.ones_like(ior))
    total_ref = cos_r2_out < 0.0
    refra_out, _ = snell_refraction(d_dir, it.n_s, dot_out, ior,
                                    jnp.ones_like(ior))
    out_F = fresnel_equation(ior, 1.0, jnp.abs(dot_out),
                             jnp.sqrt(jnp.maximum(cos_r2_out, 0.0)))
    # On internal total reflection the reference keeps the raw cosine pdf and
    # zero throughput (brdf.py:372-380); the (1-F) factor only applies when
    # the ray escapes the coating.
    d_pdf = jnp.where(total_ref, lam_pdf, lam_pdf * (1.0 - in_F))
    d_spec = eval_oren_nayar(mat, it, refra_in, refra_out) \
        * ((1.0 - in_F) * (1.0 - out_F))[..., None]
    d_spec = jnp.where(total_ref[..., None], 0.0, d_spec)
    d_dir_final = jnp.where(total_ref[..., None], d_dir, refra_out)

    # mirror branch
    m_dir, _ = inci_reflect_dir(incid, it.n_s)
    m_spec = mat.ks * in_F[..., None]

    out = jnp.where(take_reflect[..., None], m_dir, d_dir_final)
    spec = jnp.where(take_reflect[..., None], m_spec, d_spec)
    pdf = jnp.where(take_reflect, in_F, d_pdf)
    return out, spec, pdf, take_reflect


# ============================ BRDF pdf ============================

def brdf_pdf(cfg, mat, it, outdir, incid):
    """Solid-angle pdf of brdf_sample (reference brdf.py:562-601)."""
    dot_out = dot(it.n_s, outdir)
    dot_in = dot(it.n_s, incid)
    gate = dot_out * dot_in < 0.0
    pdf = jnp.zeros_like(dot_out)
    cos_pdf = dot_out * INV_PI
    for tag in cfg.brdf_types:
        if tag in (BRDFTag.BLINN_PHONG, BRDFTag.LAMBERTIAN,
                   BRDFTag.OREN_NAYAR):
            t_pdf = cos_pdf
        elif tag == BRDFTag.MOD_PHONG:
            glossiness = mat.mean[..., 2]
            reflect_view, _ = inci_reflect_dir(incid, it.n_s)
            dot_ref = jnp.maximum(0.0, dot(reflect_view, outdir))
            spec_pdf = 0.5 * (glossiness + 1.0) * INV_PI \
                * jnp.power(dot_ref, glossiness)
            p_d = jnp.max(diffuse_color(mat, it), axis=-1)
            t_pdf = p_d * cos_pdf + jnp.max(mat.ks, axis=-1) * spec_pdf
        elif tag == BRDFTag.THIN_COAT:
            reflect, _ = inci_reflect_dir(incid, it.n_s)
            in_F = _thin_coat_fresnel(mat, it, incid)
            mirror = jnp.abs(dot(outdir, reflect)) > (1.0 - 1e-3)
            t_pdf = jnp.where(mirror, in_F, (1.0 - in_F) * cos_pdf)
        elif tag == BRDFTag.FRESNEL_BLEND:
            half = normalize(outdir - incid)
            dot_half = dot(half, it.n_s)
            cos_phi2, sin_phi2 = _fresnel_cos2_sin2(half, it.n_s, dot_half)
            t_pdf = mat.kg[..., 2] * jnp.power(
                jnp.maximum(dot_half, 0.0),
                mat.kg[..., 0] * cos_phi2 + mat.kg[..., 1] * sin_phi2) \
                / jnp.maximum(jnp.abs(dot(incid, half)), 1e-9)
            t_pdf = 0.5 * (t_pdf + cos_pdf)
        elif tag == BRDFTag.MICROFACET:
            t_pdf = _ggx_pdf(mat, it, incid, outdir)
        else:  # SPECULAR: delta
            t_pdf = jnp.zeros_like(cos_pdf)
        pdf = jnp.where(mat.kind == tag, t_pdf, pdf)
    return jnp.where(gate, pdf, 0.0)


# ============================ BSDF (transmissive) ============================

def _iors(mat, it_out_dot, world_ior):
    """(ni, nr) ordered by whether the direction enters the object."""
    entering = it_out_dot < 0.0
    ni = jnp.where(entering, world_ior, mat.ior)
    nr = jnp.where(entering, mat.ior, world_ior)
    return ni, nr


def bsdf_sample(cfg, mat, it, incid, u, world_ior, mode=TRANSPORT_UNI):
    """Sampling dispatcher for BSDF types present in the scene
    (reference bsdf.py:252-262)."""
    N = incid.shape[0]
    out = jnp.zeros_like(incid)
    spec = jnp.zeros_like(mat.kd)
    pdf = jnp.zeros((N,), jnp.float32)
    is_delta = jnp.zeros((N,), bool)
    dot_normal = dot(incid, it.n_s)
    ni, nr = _iors(mat, dot_normal, world_ior)
    reflect = normalize(incid - 2.0 * it.n_s * dot_normal[..., None])
    cos_r2 = refraction_cos2(dot_normal, ni, nr)
    total = cos_r2 < 0.0
    refra_vec, _ = snell_refraction(incid, it.n_s, dot_normal, ni, nr)
    F = fresnel_equation(ni, nr, jnp.abs(dot_normal),
                         jnp.sqrt(jnp.maximum(cos_r2, 0.0)))
    base_color = diffuse_color(mat, it)
    rad_scale = jnp.where(mode == TRANSPORT_RAD, (ni * ni) / (nr * nr), 1.0)

    for tag in cfg.bsdf_types:
        if tag == BSDFTag.DET_REFRACTION:
            # reference bsdf.py:77-105
            do_refract = (~total) & (u[:, 0] > F)
            t_dir = jnp.where(do_refract[..., None], refra_vec, reflect)
            t_pdf = jnp.where(total, 1.0, jnp.where(do_refract, 1.0 - F, F))
            t_int = base_color * jnp.where(do_refract, rad_scale,
                                           1.0)[..., None]
            t_spec = t_int * t_pdf[..., None]
            t_delta = jnp.ones((N,), bool)
        elif tag == BSDFTag.LAMBERTIAN:
            # reference bsdf.py:139-175
            do_refract = (~total) & (u[:, 0] > F)
            local_dir, lam_pdf = cosine_hemisphere(u[:, 1], u[:, 2])
            normal = jnp.sign(dot_normal)[..., None] * it.n_s
            d_dir = delocalize_rotate(normal, local_dir)
            cos_term = jnp.maximum(0.0, dot(normal, d_dir))
            d_int = base_color * (INV_PI * cos_term
                                  * rad_scale)[..., None] \
                * (1.0 - F)[..., None]
            t_dir = jnp.where(do_refract[..., None], d_dir, reflect)
            t_spec = jnp.where(do_refract[..., None], d_int,
                               base_color * F[..., None])
            t_spec = jnp.where(total[..., None], base_color, t_spec)
            t_pdf = jnp.where(do_refract, lam_pdf * (1.0 - F),
                              jnp.where(total, 1.0, F))
            t_delta = ~do_refract
        else:  # NULL: passthrough (handled by the integrator for vpt)
            t_dir = incid
            t_spec = jnp.ones_like(mat.kd)
            t_pdf = jnp.ones((N,), jnp.float32)
            t_delta = jnp.ones((N,), bool)
        m = (mat.kind == tag) & mat.is_bsdf
        out = jnp.where(m[..., None], t_dir, out)
        spec = jnp.where(m[..., None], t_spec, spec)
        pdf = jnp.where(m, t_pdf, pdf)
        is_delta = jnp.where(m, t_delta, is_delta)
    return out, spec, pdf, is_delta


def bsdf_eval(cfg, mat, it, incid, out, world_ior, mode=TRANSPORT_UNI):
    """Eval dispatcher (reference bsdf.py:242-250). `incid` is the arriving
    ray (into surface), `out` the scattered direction being evaluated."""
    # NOTE on argument order parity: eval derives ni/nr from `out`
    # (reference bsdf.py:108-135 treats eval as light->eye transport).
    dot_out = dot(out, it.n_s)
    ni, nr = _iors(mat, dot_out, world_ior)
    ref_dir = normalize(out - 2.0 * it.n_s * dot_out[..., None])
    cos_r2 = refraction_cos2(dot_out, ni, nr)
    total = cos_r2 < 0.0
    refra_vec, _ = snell_refraction(out, it.n_s, dot_out, ni, nr)
    F = fresnel_equation(ni, nr, jnp.abs(dot_out),
                         jnp.sqrt(jnp.maximum(cos_r2, 0.0)))
    base_color = diffuse_color(mat, it)
    rad_scale = jnp.where(mode == TRANSPORT_RAD, (ni * ni) / (nr * nr), 1.0)
    near_ref = dot(ref_dir, incid) > 1.0 - 1e-4
    res = jnp.zeros_like(mat.kd)

    for tag in cfg.bsdf_types:
        if tag == BSDFTag.DET_REFRACTION:
            near_refra = dot(refra_vec, incid) > 1.0 - 1e-4
            val = jnp.where(
                total[..., None],
                jnp.where((dot(ref_dir, incid) > 1.0 - 5e-5)[..., None],
                          base_color, 0.0),
                jnp.where(near_refra[..., None],
                          base_color * ((1.0 - F) * rad_scale)[..., None],
                          jnp.where(near_ref[..., None],
                                    base_color * F[..., None], 0.0)))
        elif tag == BSDFTag.LAMBERTIAN:
            dot_in = dot(incid, it.n_s)
            same_side = dot_in * dot_out < 0.0   # reflection configuration
            refl_val = jnp.where((same_side & near_ref)[..., None],
                                 base_color * F[..., None], 0.0)
            trans_val = base_color * ((1.0 - F) * INV_PI
                                      * jnp.abs(dot_out) * rad_scale)[..., None]
            val = jnp.where(total[..., None],
                            jnp.where(near_ref[..., None], base_color, 0.0),
                            jnp.where(same_side[..., None], refl_val,
                                      trans_val))
        else:  # NULL
            val = jnp.zeros_like(mat.kd)
        res = jnp.where((mat.kind == tag)[..., None] & mat.is_bsdf[..., None],
                        val, res)
    return res


def bsdf_pdf(cfg, mat, it, outdir, incid, world_ior):
    """Reference bsdf.py:211-236; outdir is the next-ray direction whose pdf
    we ask for, incid the arriving ray."""
    dot_out = dot(outdir, it.n_s)
    ni, nr = _iors(mat, dot_out, world_ior)
    ref_dir = normalize(outdir - 2.0 * it.n_s * dot_out[..., None])
    cos_r2 = refraction_cos2(dot_out, ni, nr)
    total = cos_r2 < 0.0
    refra_vec, _ = snell_refraction(outdir, it.n_s, dot_out, ni, nr)
    F = fresnel_equation(ni, nr, jnp.abs(dot_out),
                         jnp.sqrt(jnp.maximum(cos_r2, 0.0)))
    near_ref = dot(ref_dir, incid) > 1.0 - 1e-4
    pdf = jnp.zeros_like(dot_out)
    for tag in cfg.bsdf_types:
        if tag == BSDFTag.NULL:
            t_pdf = jnp.where(dot(incid, outdir) > 1.0 - 1e-4, 1.0, 0.0)
        elif tag == BSDFTag.DET_REFRACTION:
            near_refra = dot(refra_vec, incid) > 1.0 - 1e-4
            t_pdf = jnp.where(total, jnp.where(near_ref, 1.0, 0.0),
                              jnp.where(near_ref, F,
                                        jnp.where(near_refra, 1.0 - F, 0.0)))
        else:  # LAMBERTIAN transmission
            dot_in = dot(incid, it.n_s)
            trans_cfg = dot_in * dot_out > 0.0
            t_pdf = jnp.where(
                total, jnp.where(near_ref, 1.0, 0.0),
                jnp.where(near_ref, F,
                          jnp.where(trans_cfg,
                                    (1.0 - F) * jnp.abs(dot_out) * INV_PI,
                                    0.0)))
        pdf = jnp.where((mat.kind == tag) & mat.is_bsdf, t_pdf, pdf)
    return pdf


# ============================ unified dispatch ============================

def _apply_two_sides(cfg, mat, it, incid):
    """Flip normals for back-facing BRDF hits (reference path_tracer.py:449-453)."""
    if not cfg.brdf_two_sides:
        return it
    flip = (dot(incid, it.n_s) > 0.0) & ~mat.is_bsdf
    n_s = jnp.where(flip[..., None], -it.n_s, it.n_s)
    n_g = jnp.where(flip[..., None], -it.n_g, it.n_g)
    return dataclasses.replace(it, n_s=n_s, n_g=n_g)


def _mixture_lanes(scene, it):
    """(clamped mixture row, lane-is-mixture mask) for the overlay."""
    from .gather import tgather
    mix_id = tgather(scene.obj_mixture, jnp.maximum(it.obj_id, 0))
    return jnp.maximum(mix_id, 0), (it.obj_id >= 0) & (mix_id >= 0)


def surface_eval(cfg, mat, it, incid, out, world_ior,
                 mode=TRANSPORT_UNI, scene=None):
    """PathTracer.eval for surface interactions (path_tracer.py:459-479).

    scene: pass the SceneData to enable BxDF-mixture lanes (reference
    bxdf/mixture.py, `more` branch). Statically free when the scene has
    no mixtures (scene.mixture is None) or scene is omitted."""
    it = _apply_two_sides(cfg, mat, it, incid)
    res = jnp.zeros_like(mat.kd)
    if cfg.brdf_types:
        res = jnp.where(~mat.is_bsdf[..., None],
                        brdf_eval(cfg, mat, it, incid, out), res)
    if cfg.bsdf_types:
        res = jnp.where(mat.is_bsdf[..., None],
                        bsdf_eval(cfg, mat, it, incid, out, world_ior, mode),
                        res)
    if scene is not None and scene.mixture is not None:
        from . import mixture_ops
        mid, is_mix = _mixture_lanes(scene, it)
        m_res = mixture_ops.mixture_eval(scene, cfg, scene.mixture, mid,
                                         it, incid, out, world_ior, mode)
        res = jnp.where(is_mix[..., None], m_res, res)
    return res


def surface_sample(cfg, mat, it, incid, u, world_ior, mode=TRANSPORT_UNI,
                   scene=None):
    """PathTracer.sample_new_ray surface path (path_tracer.py:447-457).
    scene: see surface_eval (mixture lanes)."""
    it = _apply_two_sides(cfg, mat, it, incid)
    N = incid.shape[0]
    out = jnp.tile(jnp.array([0.0, 1.0, 0.0], jnp.float32), (N, 1))
    spec = jnp.ones_like(mat.kd)
    pdf = jnp.ones((N,), jnp.float32)
    is_specular = jnp.zeros((N,), bool)
    if cfg.brdf_types:
        b_out, b_spec, b_pdf, b_del = brdf_sample(cfg, mat, it, incid, u)
        sel = ~mat.is_bsdf
        out = jnp.where(sel[..., None], b_out, out)
        spec = jnp.where(sel[..., None], b_spec, spec)
        pdf = jnp.where(sel, b_pdf, pdf)
        is_specular = jnp.where(sel, b_del, is_specular)
    if cfg.bsdf_types:
        s_out, s_spec, s_pdf, s_del = bsdf_sample(cfg, mat, it, incid, u,
                                                  world_ior, mode)
        sel = mat.is_bsdf
        out = jnp.where(sel[..., None], s_out, out)
        spec = jnp.where(sel[..., None], s_spec, spec)
        pdf = jnp.where(sel, s_pdf, pdf)
        is_specular = jnp.where(sel, s_del, is_specular)
    if scene is not None and scene.mixture is not None:
        from . import mixture_ops
        mid, is_mix = _mixture_lanes(scene, it)
        m_out, m_spec, m_pdf, m_del = mixture_ops.mixture_sample(
            scene, cfg, scene.mixture, mid, it, incid, u, world_ior, mode)
        out = jnp.where(is_mix[..., None], m_out, out)
        spec = jnp.where(is_mix[..., None], m_spec, spec)
        pdf = jnp.where(is_mix, m_pdf, pdf)
        is_specular = jnp.where(is_mix, m_del, is_specular)
    return out, spec, pdf, is_specular


def surface_pdf(cfg, mat, it, outdir, incid, world_ior, scene=None):
    """PathTracer.surface_pdf (path_tracer.py:481-494).
    scene: see surface_eval (mixture lanes)."""
    it = _apply_two_sides(cfg, mat, it, incid)
    pdf = jnp.zeros(incid.shape[:-1], jnp.float32)
    if cfg.brdf_types:
        pdf = jnp.where(~mat.is_bsdf, brdf_pdf(cfg, mat, it, outdir, incid),
                        pdf)
    if cfg.bsdf_types:
        pdf = jnp.where(mat.is_bsdf,
                        bsdf_pdf(cfg, mat, it, outdir, incid, world_ior), pdf)
    if scene is not None and scene.mixture is not None:
        from . import mixture_ops
        mid, is_mix = _mixture_lanes(scene, it)
        m_pdf = mixture_ops.mixture_pdf(scene, cfg, scene.mixture, mid,
                                        it, outdir, incid, world_ior)
        pdf = jnp.where(is_mix, m_pdf, pdf)
    return pdf
