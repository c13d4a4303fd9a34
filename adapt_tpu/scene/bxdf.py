"""Host-side BxDF object model (XML -> typed numpy records).

Mirrors the parse/precompute semantics of the reference's host classes
(bxdf/brdf.py:35-140 `BRDF_np`, bxdf/bsdf.py:29-58 `BSDF_np`) without any
device code — device evaluation lives in adapt_tpu/ops/bxdf_ops.py, operating
on the SoA tables these records export into.
"""
from __future__ import annotations

import warnings
import numpy as np
import xml.etree.ElementTree as xet

from ..constants import BRDFTag, BSDFTag, DEG2RAD
from ..parsers.general import rgb_parse
from .medium import MediumRec

ALBEDO_NAMES = {"reflectance", "albedo", "k_d"}
GLOSS_NAMES  = {"glossiness", "shininess", "roughness", "sigma", "k_g"}
SPEC_NAMES   = {"specular", "ref_ior", "k_s"}

BRDF_TYPE_MAP = {"phong": BRDFTag.BLINN_PHONG, "lambertian": BRDFTag.LAMBERTIAN,
                 "specular": BRDFTag.SPECULAR, "microfacet": BRDFTag.MICROFACET,
                 "mod-phong": BRDFTag.MOD_PHONG,
                 "fresnel-blend": BRDFTag.FRESNEL_BLEND,
                 "oren-nayar": BRDFTag.OREN_NAYAR, "thin-coat": BRDFTag.THIN_COAT}

BSDF_TYPE_MAP = {"det-refraction": BSDFTag.DET_REFRACTION,
                 "null": BSDFTag.NULL, "lambertian": BSDFTag.LAMBERTIAN}


def roughness_to_alpha(roughness: np.ndarray) -> np.ndarray:
    """PBRT-v3 TrowbridgeReitz roughness->alpha fit (reference brdf.py:115-120)."""
    x = np.log(np.maximum(roughness, 1e-3))
    return (1.62142 + 0.819955 * x + 0.1734 * x ** 2 + 0.0171201 * x ** 3
            + 0.000640711 * x ** 4)


class BRDF_np:
    """Opaque-surface material record parsed from a <brdf> element."""

    is_bsdf = False

    def __init__(self, elem: xet.Element, defer_setup: bool = False):
        self.type: str = elem.get("type")
        self.id: str = elem.get("id")
        self.type_id = BRDF_TYPE_MAP.get(self.type, -1)
        self.k_d = np.ones(3, np.float32)
        self.k_s = np.zeros(3, np.float32)
        self.k_g = np.ones(3, np.float32)
        self.is_delta = False

        for rgb_node in elem.findall("rgb"):
            name = rgb_node.get("name")
            if name is None:
                raise ValueError(f"RGB node in BxDF <{self.id}> has no name")
            if name in ALBEDO_NAMES:
                self.k_d = rgb_parse(rgb_node)
            elif name in SPEC_NAMES:
                self.k_s = rgb_parse(rgb_node)
            elif name in GLOSS_NAMES:
                self.k_g = rgb_parse(rgb_node)
                if name == "roughness":
                    # GGX alpha precompute (reference brdf.py:97-103)
                    self.k_g = roughness_to_alpha(
                        np.clip(self.k_g, 0.0, 1.0)).astype(np.float32)
                elif name == "sigma":
                    # Oren-Nayar sigma -> (A, B) precompute; k_g[2] keeps the
                    # thin-coat IOR (reference brdf.py:104-110)
                    sigma = float(self.k_g[0]) * DEG2RAD
                    sigma2 = sigma * sigma
                    self.k_g = self.k_g.copy()
                    self.k_g[0] = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
                    self.k_g[1] = 0.45 * sigma2 / (sigma2 + 0.09)
                    self.k_g[2] = max(1.0, float(self.k_g[2]))

        if not defer_setup:
            self.setup()

    def setup(self):
        if self.type not in BRDF_TYPE_MAP:
            raise NotImplementedError(f"Unknown BRDF type: {self.type}")
        if self.type_id == BRDFTag.SPECULAR:
            self.is_delta = True
        elif self.type_id == BRDFTag.FRESNEL_BLEND:
            # Precompute sqrt((n_u+1)(n_v+1)) / 8pi into k_g[2]
            # (reference brdf.py:127-128)
            self.k_g = self.k_g.copy()
            self.k_g[2] = np.sqrt((self.k_g[0] + 1.0) * (self.k_g[1] + 1.0)) \
                / (8.0 * np.pi)

    @property
    def mean(self) -> np.ndarray:
        """Per-channel means used by mod-phong sampling (brdf.py:136)."""
        return np.array([self.k_d.mean(), self.k_s.mean(), self.k_g.mean()],
                        dtype=np.float32)

    @property
    def medium(self) -> MediumRec:
        return MediumRec.transparent()

    def __repr__(self):
        return f"<BRDF {self.type} id={self.id}>"


class BSDF_np(BRDF_np):
    """Transmissive material record from a <bsdf> element; carries a medium."""

    is_bsdf = True

    def __init__(self, elem: xet.Element):
        super().__init__(elem, defer_setup=True)
        self._medium = MediumRec(elem.find("medium"))
        self.setup()
        self.is_delta = (self.type_id == BSDFTag.DET_REFRACTION)

    def setup(self):
        if self.type not in BSDF_TYPE_MAP:
            raise NotImplementedError(f"Unknown BSDF type: {self.type}")
        self.type_id = BSDF_TYPE_MAP[self.type]

    @property
    def medium(self) -> MediumRec:
        return self._medium

    def __repr__(self):
        return f"<BSDF {self.type} id={self.id} medium={self._medium!r}>"


MIXTURE_SLOTS = ("diffuse", "glossy", "specular", "transmit")


class Mixture_np:
    """BxDF mixture host record (reference bxdf/mixture.py:30-50, live on
    the reference's `more` branch only — here it parses whenever a scene
    asks for it).

    XML form:
        <brdf type="mixture" id="coat">
            <ref name="diffuse"  id="some-brdf-id"/>
            <ref name="glossy"   id="other-brdf-id"/>
            <float name="p_d" value="0.7"/>
            <float name="p_g" value="0.3"/>
        </brdf>
    Component slots are diffuse/glossy/specular/transmit with proportions
    p_d/p_g/p_s/p_t (mixture.py:35-50); proportions must sum to <= 1 (the
    remainder absorbs, mixture.py:55-60). Components reference other
    declared BxDFs by id and may not themselves be mixtures."""

    is_bsdf = False
    is_delta = False
    type = "mixture"

    def __init__(self, elem: xet.Element):
        from ..constants import BRDFTag
        self.id: str = elem.get("id")
        self.type_id = BRDFTag.MIXTURE
        # parse-time placeholders for the (unused) own material row
        self.k_d = np.ones(3, np.float32)
        self.k_s = np.zeros(3, np.float32)
        self.k_g = np.ones(3, np.float32)
        self.comp_ref: dict[str, str] = {}
        self.components: dict = {}        # resolved by resolve()
        self.probs = np.zeros(4, np.float32)
        for ref in elem.findall("ref"):
            slot = ref.get("name")
            if slot not in MIXTURE_SLOTS:
                raise ValueError(f"mixture <{self.id}>: unknown component "
                                 f"slot '{slot}' (use {MIXTURE_SLOTS})")
            self.comp_ref[slot] = ref.get("id")
        for f in elem.findall("float"):
            name = f.get("name")
            if name in ("p_d", "p_g", "p_s", "p_t"):
                self.probs[("p_d", "p_g", "p_s", "p_t").index(name)] = \
                    float(f.get("value"))
        if not self.comp_ref:
            raise ValueError(f"mixture <{self.id}> has no components")
        if self.probs.sum() > 1.0 + 1e-5:
            raise ValueError(f"mixture <{self.id}> proportions sum to "
                             f"{self.probs.sum():.4f} > 1")

    def resolve(self, bxdf_dict: dict):
        """Bind component id strings to their parsed records."""
        for slot, ref_id in self.comp_ref.items():
            if ref_id not in bxdf_dict:
                raise KeyError(f"mixture <{self.id}>: component '{ref_id}' "
                               "is not a declared BxDF")
            comp = bxdf_dict[ref_id]
            if isinstance(comp, Mixture_np):
                raise ValueError(f"mixture <{self.id}>: component "
                                 f"'{ref_id}' is itself a mixture")
            si = MIXTURE_SLOTS.index(slot)
            if slot == "transmit" and not comp.is_bsdf:
                raise ValueError(f"mixture <{self.id}>: transmit slot "
                                 f"needs a BSDF, got brdf '{ref_id}'")
            if self.probs[si] <= 0.0:
                warnings.warn(f"mixture <{self.id}>: component '{ref_id}' "
                              f"({slot}) has zero proportion")
            self.components[slot] = comp

    @property
    def mean(self) -> np.ndarray:
        return np.ones(3, np.float32)

    @property
    def medium(self) -> MediumRec:
        return MediumRec.transparent()

    def __repr__(self):
        return f"<Mixture id={self.id} {list(self.comp_ref)} {self.probs}>"


def parse_bxdf_node(node: xet.Element):
    """Dispatch a <brdf>/<bsdf> element to the right host class
    (reference xml_parser.py:178-194)."""
    if node.get("type") == "mixture":
        return Mixture_np(node)
    if node.tag == "brdf":
        return BRDF_np(node)
    return BSDF_np(node)
