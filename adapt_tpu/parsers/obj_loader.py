"""Wavefront OBJ loader (host side, pure python + numpy).

Replaces the reference's pywavefront dependency (parsers/obj_loader.py:21-80)
with a direct parser. Output contract matches the reference:
  faces  : (N, 3, 3) float32 triangle vertices
  n_g    : (N, 3)    geometric normals (recomputed from winding)
  vn     : (N, 3, 3) per-vertex shading normals or None
  uv     : (N, 3, 2) per-vertex uv coords or None
Polygon faces are fan-triangulated; negative OBJ indices are supported.
"""
from __future__ import annotations

import numpy as np

from ..constants import TRIANGLE_MESH, SPHERE

__all__ = ["load_obj", "apply_transform", "calculate_surface_area"]


def _resolve(idx: int, count: int) -> int:
    return idx - 1 if idx > 0 else count + idx


def load_obj(path: str):
    """Parse an OBJ file into per-face triangle soup (see module docstring)."""
    verts, norms, uvs = [], [], []
    face_v, face_vt, face_vn = [], [], []
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                norms.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif tag == "f":
                corners = []
                for tok in parts[1:]:
                    sub = tok.split("/")
                    vi = _resolve(int(sub[0]), len(verts))
                    ti = (_resolve(int(sub[1]), len(uvs))
                          if len(sub) > 1 and sub[1] else -1)
                    ni = (_resolve(int(sub[2]), len(norms))
                          if len(sub) > 2 and sub[2] else -1)
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):  # fan triangulation
                    tri = (corners[0], corners[k], corners[k + 1])
                    face_v.append([c[0] for c in tri])
                    face_vt.append([c[1] for c in tri])
                    face_vn.append([c[2] for c in tri])

    if not face_v:
        raise ValueError(f"OBJ file '{path}' contains no faces")
    verts = np.asarray(verts, dtype=np.float32)
    face_v = np.asarray(face_v, dtype=np.int64)
    faces = verts[face_v]                                     # (N, 3, 3)

    # Geometric normal from winding: cross(p1-p0, p2-p1), normalized
    # (same convention as reference obj_loader.py:71-74).
    dp1 = faces[:, 1] - faces[:, 0]
    dp2 = faces[:, 2] - faces[:, 1]
    n_g = np.cross(dp1, dp2)
    n_g /= np.maximum(np.linalg.norm(n_g, axis=-1, keepdims=True), 1e-12)

    vn = None
    face_vn = np.asarray(face_vn, dtype=np.int64)
    if norms and (face_vn >= 0).all():
        vn_arr = np.asarray(norms, dtype=np.float32)[face_vn]  # (N, 3, 3)
        vn = vn_arr

    uv = None
    face_vt = np.asarray(face_vt, dtype=np.int64)
    if uvs and (face_vt >= 0).all():
        uv = np.asarray(uvs, dtype=np.float32)[face_vt]        # (N, 3, 2)

    return faces.astype(np.float32), n_g.astype(np.float32), vn, uv


def calculate_surface_area(meshes: np.ndarray, _type: int = TRIANGLE_MESH) -> float:
    """Total surface area of a triangle soup, or the sphere formula.

    Mirrors reference obj_loader.py:82-93 (used for attached-emitter pdf).
    """
    if _type == SPHERE:
        radius = float(meshes[0, 1, 0])
        return 4.0 * np.pi * radius * radius
    dv1 = meshes[:, 1] - meshes[:, 0]
    dv2 = meshes[:, 2] - meshes[:, 0]
    return float(np.linalg.norm(np.cross(dv1, dv2), axis=-1).sum() * 0.5)


def apply_transform(meshes, normals, trans_r, trans_t, trans_s, verbose=True):
    """Apply intrinsic rotation about centroid then translation.

    Parity note: the reference (obj_loader.py:100-122) warns on non-uniform
    scale and then never applies scale at all; we reproduce that behavior so
    shipped scenes render identically (none of them rely on <scale>).
    Rotation is a right-multiplication about the mesh centroid.
    """
    if trans_s is not None and verbose:
        import warnings
        warnings.warn("<scale> on shapes is parsed but not applied "
                      "(reference-compatible behavior)")
    if trans_r is not None:
        if np.ndim(trans_r) != 2:
            raise ValueError(
                "shape <transform> must use rotate/translate, not <lookat>"
                " (a lookat direction vector would collapse the mesh)")
        center = meshes.mean(axis=1).mean(axis=0)
        meshes = (meshes - center) @ trans_r + center
        if normals is not None:
            normals = normals @ trans_r
    if trans_t is not None:
        meshes = meshes + trans_t
    return meshes, normals
