"""Host-side object descriptor (mirrors reference parsers/obj_desc.py:28-65)."""
from __future__ import annotations

import numpy as np

from ..constants import TRIANGLE_MESH, SPHERE

AABB_EPS = 1e-4


def get_aabb(meshes: np.ndarray, is_sphere: bool = False) -> np.ndarray:
    """Axis-aligned bounding box (2,3); degenerate planar extents get padded
    so slab tests stay well-conditioned (reference obj_desc.py:9-25)."""
    if is_sphere:
        center, radius = meshes[0, 0], meshes[0, 1, 0]
        return np.stack([center - radius, center + radius]).astype(np.float32)
    mini = meshes.reshape(-1, 3).min(axis=0)
    maxi = meshes.reshape(-1, 3).max(axis=0)
    degenerate = (maxi - mini) < AABB_EPS
    mini = np.where(degenerate, mini - AABB_EPS, mini)
    maxi = np.where(degenerate, maxi + AABB_EPS, maxi)
    return np.stack([mini, maxi]).astype(np.float32)


class ObjDescriptor:
    """One scene object: triangle soup / sphere + material + refs."""

    def __init__(self, meshes, normals, bxdf, vns=None, uvs=None,
                 texture_group=None, trans_r=None, trans_t=None,
                 emitter_ref_id=-1, obj_type=TRIANGLE_MESH):
        self.meshes = meshes          # (N,3,3); sphere padded to (1,3,3)
        self.normals = normals        # (N,3)
        self.bxdf = bxdf              # BRDF_np or BSDF_np host object
        self.vns = vns                # (N,3,3) vertex normals or None
        self.uvs = uvs                # (N,3,2) or None
        self.texture_group = texture_group or {
            "albedo": None, "normal": None, "bump": None, "roughness": None}
        self.trans_r = trans_r
        self.trans_t = trans_t
        self.emitter_ref_id = emitter_ref_id
        self.type = obj_type
        self.tri_num = meshes.shape[0]
        self.aabb = get_aabb(meshes, obj_type == SPHERE)

    def __repr__(self):
        kind = "sphere" if self.type == SPHERE else "mesh"
        return (f"<ObjDescriptor {kind} prims={self.tri_num} "
                f"emitter={self.emitter_ref_id} bxdf={self.bxdf!r}>")
