"""Independent brute-force CPU implementations used as test oracles.

Deliberately written in plain numpy with textbook algorithms (Möller-Trumbore,
direct integration) and NO shared code with adapt_tpu device ops, so that
agreement between the two is meaningful evidence of correctness.
"""
import numpy as np


def mt_intersect(ray_o, ray_d, tris, eps=1e-4):
    """Möller-Trumbore closest hit of one ray against (T,3,3) triangles.

    Returns (t, prim_id, u, v); t=inf, prim=-1 on miss.
    """
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(ray_d[None, :], e2)
    det = np.einsum("td,td->t", e1, pvec)
    ok = np.abs(det) > 1e-12
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = ray_o[None, :] - v0
    u = np.einsum("td,td->t", tvec, pvec) * inv_det
    qvec = np.cross(tvec, e1)
    v = np.einsum("d,td->t", ray_d, qvec) * inv_det
    t = np.einsum("td,td->t", e2, qvec) * inv_det
    valid = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps)
    t = np.where(valid, t, np.inf)
    idx = int(np.argmin(t))
    if not np.isfinite(t[idx]):
        return np.inf, -1, 0.0, 0.0
    return float(t[idx]), idx, float(u[idx]), float(v[idx])


def mt_occluded(ray_o, ray_d, max_t, tris, eps=1e-4):
    t, idx, _, _ = mt_intersect(ray_o, ray_d, tris, eps)
    return idx >= 0 and t < max_t - eps


def direct_lighting_point(ray_o, ray_d, tris, tri_obj, albedo, normals,
                          light_pos, light_int):
    """Single-bounce direct lighting under one point light (no emission hit).

    Mirrors the estimator contract of the reference renderer: NEE toward the
    point source with intensity * min(1/d^2, 1) falloff, cosine-weighted
    Lambertian BRDF (kd/pi * cos), binary visibility.
    """
    t, prim, _, _ = mt_intersect(ray_o, ray_d, tris)
    if prim < 0:
        return np.zeros(3)
    hit = ray_o + t * ray_d
    n = normals[prim]
    if np.dot(n, ray_d) > 0:
        pass  # one-sided: eval below handles the hemisphere check
    to_l = light_pos - hit
    d = np.linalg.norm(to_l)
    ld = to_l / d
    if np.dot(n, ld) <= 0:
        return np.zeros(3)
    if mt_occluded(hit, ld, d, tris):
        return np.zeros(3)
    atten = min(1.0 / max(d * d, 1e-5), 1.0)
    kd = albedo[tri_obj[prim]]
    return kd / np.pi * np.dot(n, ld) * light_int * atten


def blinn_phong_direct(ray_o, ray_d, tris, tri_obj, kd, ks, kg, normals,
                       light_pos, light_int):
    """Blinn-Phong preview shading for one ray (reference
    direct_render.py:26-134 contract): diffuse kd*cos(n,l) + specular
    ks*cos(n,h)^shininess, point-light 1/d^2 falloff capped at 1, hard
    shadow, no emission."""
    t, prim, _, _ = mt_intersect(ray_o, ray_d, tris)
    if prim < 0:
        return np.zeros(3)
    hit = ray_o + t * ray_d
    n = normals[prim]
    to_l = light_pos - hit
    d = np.linalg.norm(to_l)
    ld = to_l / d
    if mt_occluded(hit, ld, d, tris):
        return np.zeros(3)
    half = ld - ray_d
    half = half / np.linalg.norm(half)
    cos_n = max(np.dot(n, ld), 0.0)
    spec_cos = max(np.dot(n, half), 0.0)
    o = tri_obj[prim]
    shininess = max(kg[o][0], 1.0)
    atten = min(1.0 / max(d * d, 1e-5), 1.0)
    return (kd[o] * cos_n + ks[o] * spec_cos ** shininess) \
        * light_int * atten
