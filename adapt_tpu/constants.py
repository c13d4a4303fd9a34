"""Shared enumerant tags and math constants.

Numeric tag values intentionally match the reference renderer so that scenes
parse to identical type ids (reference: renderer/constants.py:10-53,
emitters/abtract_source.py:30-33, bxdf/medium.py:22).
"""
import math

# ---- BxDF type tags (reference: renderer/constants.py:45-53) ----
class BRDFTag:
    BLINN_PHONG   = 0
    LAMBERTIAN    = 1
    SPECULAR      = 2
    MICROFACET    = 3
    MOD_PHONG     = 4
    FRESNEL_BLEND = 5
    OREN_NAYAR    = 6
    THIN_COAT     = 7
    # BxDF mixture (reference bxdf/mixture.py — live only on its `more`
    # branch; no numeric tag exists on main, 8 is free). Never appears in
    # cfg.brdf_types: mixture lanes are overlaid on top of the component
    # dispatch (ops/mixture_ops.py), not routed through the eval tables.
    MIXTURE       = 8


class BSDFTag:
    # reference: bxdf/bsdf.py type mapping {det-refraction:0, null:-1, lambertian:1}
    DET_REFRACTION = 0
    LAMBERTIAN     = 1
    NULL           = -1


# ---- Emitter type tags (reference: emitters/abtract_source.py:30-33) ----
class EmitterTag:
    POINT      = 0
    AREA       = 1
    SPOT       = 2
    COLLIMATED = 4


# Emitter bool_bits layout (reference: emitters/abtract_source.py:47):
# [0 pos-delta, 1 dir-delta, 2 is-area, 3 is-infinite, 4 in-free-space, 5 delta]
BIT_POS_DELTA  = 0x01
BIT_DIR_DELTA  = 0x02
BIT_IS_AREA    = 0x04
BIT_INFINITE   = 0x08
BIT_FREE_SPACE = 0x10


# ---- Medium type tags (reference: bxdf/medium.py:22) ----
class MediumTag:
    HG          = 0
    MULTI_HG    = 1
    RAYLEIGH    = 2
    MIE         = 3
    TRANSPARENT = -1


# ---- Grid volume tags (reference: bxdf/volume.py:36-40) ----
class VolumeTag:
    NONE = 0
    MONO = 1
    RGB  = 2


# ---- Transient decomposition modes (reference: renderer/constants.py:22-24) ----
STEADY_STATE  = 0
TRANSIENT_CAM = 1
TRANSIENT_LIT = 2

# ---- Transport modes (reference: renderer/constants.py:10-12) ----
TRANSPORT_UNI = -1
TRANSPORT_RAD = 0
TRANSPORT_IMP = 1

# ---- Vertex types for BDPT (reference: renderer/constants.py:14-18) ----
VERTEX_SURFACE = 0
VERTEX_MEDIUM  = 1
VERTEX_EMITTER = 2
VERTEX_CAMERA  = 3
VERTEX_NULL    = -1

# ---- Shape tags ----
TRIANGLE_MESH = 0
SPHERE        = 1

# ---- Math ----
PI       = math.pi
INV_PI   = 1.0 / math.pi
INV_2PI  = 0.5 / math.pi
INV_4PI  = 0.25 / math.pi
PI2      = 2.0 * math.pi
PI_DIV2  = math.pi / 2.0
PI_DIV4  = math.pi / 4.0
DEG2RAD  = math.pi / 180.0
RAD2DEG  = 180.0 / math.pi
