"""Host-side participating-medium record (reference bxdf/medium.py:22-83)."""
from __future__ import annotations

import numpy as np
import xml.etree.ElementTree as xet

from ..constants import MediumTag
from ..parsers.general import get, rgb_parse

MEDIUM_TYPE_MAP = {"hg": MediumTag.HG, "multi-hg": MediumTag.MULTI_HG,
                   "rayleigh": MediumTag.RAYLEIGH, "mie": MediumTag.MIE,
                   "transparent": MediumTag.TRANSPARENT}


class MediumRec:
    """Homogeneous medium: absorption/scattering/extinction + phase params."""

    def __init__(self, elem: xet.Element | None = None):
        self.ior = 1.0
        self.u_a = np.zeros(3, np.float32)
        self.u_s = np.zeros(3, np.float32)
        self.par = np.zeros(3, np.float32)       # phase parameters (e.g. HG g)
        self.pdf = np.array([1.0, 0.0, 0.0], np.float32)  # multi-HG lobe pdf
        self.type_id = MediumTag.TRANSPARENT
        self.type_name = "transparent"

        if elem is not None:
            type_name = elem.get("type")
            if type_name not in MEDIUM_TYPE_MAP:
                raise NotImplementedError(f"Medium type '{type_name}' unsupported")
            self.type_id = MEDIUM_TYPE_MAP[type_name]
            self.type_name = type_name
            for tag, query in (("rgb", rgb_parse),
                               ("float", lambda el: get(el, "value"))):
                for child in elem.findall(tag):
                    name = child.get("name")
                    if name is not None and hasattr(self, name):
                        setattr(self, name, query(child))
        self.u_e = (self.u_a + self.u_s).astype(np.float32)
        if self.type_id == MediumTag.MIE:
            # reference marks mie unimplemented; the device phase dispatch
            # would silently fall back to isotropic scattering
            raise NotImplementedError(
                "medium type 'mie' is unimplemented (reference parity: "
                "bxdf/medium.py maps it but ships no phase function)")
        if self.type_id == MediumTag.MULTI_HG:
            # the lobe pdf is used BOTH as the selection CDF and the
            # mixture weights (phase value doubles as the MIS pdf), so an
            # unnormalized input silently biases throughput — normalize
            # with a warning instead
            tot = float(np.sum(self.pdf))
            if not np.isclose(tot, 1.0, atol=1e-3):
                import warnings
                warnings.warn(f"multi-hg lobe pdf sums to {tot:.4f}; "
                              "normalizing", stacklevel=2)
                self.pdf = (np.asarray(self.pdf, np.float32)
                            / max(tot, 1e-8))

    @classmethod
    def transparent(cls) -> "MediumRec":
        return cls(None)

    @property
    def is_scattering(self) -> bool:
        return self.type_id >= 0

    def __repr__(self):
        return (f"<Medium {self.type_name} ior={self.ior:.3f} "
                f"u_e={self.u_e.tolist()}>")
