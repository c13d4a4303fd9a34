"""Host-side light source records (reference emitters/*.py).

Four emitter kinds — point / area / spot / collimated — parsed into one
uniform record; device sampling lives in adapt_tpu/ops/emitter_ops.py.
Field semantics follow emitters/abtract_source.py:246-281 and the concrete
subclasses (point.py:19-28, area.py:15-27, spot.py:18-52, collimated.py:22-61).
"""
from __future__ import annotations

import numpy as np
import xml.etree.ElementTree as xet

from ..constants import (EmitterTag, DEG2RAD, INV_PI, BIT_POS_DELTA,
                         BIT_DIR_DELTA, BIT_IS_AREA, BIT_FREE_SPACE)
from ..parsers.general import get, rgb_parse, vec3d_parse


class LightSource:
    """One emitter record; `kind` is an EmitterTag."""

    def __init__(self, elem: xet.Element):
        self.type: str = elem.get("type")
        self.id: str = elem.get("id")
        self.intensity = np.ones(3, np.float32)
        for rgb_elem in elem.findall("rgb"):
            name = rgb_elem.get("name")
            if name == "emission":
                self.intensity = rgb_parse(rgb_elem)
            elif name == "scaler":
                self.intensity = self.intensity * rgb_parse(rgb_elem)
        self.pos = np.zeros(3, np.float32)
        self.dir = np.array([0.0, 0.0, 1.0], np.float32)
        self.r = 0.0                 # spot: cos(half-angle); collimated: radius
        self.inv_area = 1.0
        self.attached = False        # set when a shape references this emitter
        self.in_free_space = True
        self.emit_time = 0.0

        bool_elem = elem.find("boolean")
        if bool_elem is not None and bool_elem.get("value", "").lower() == "false":
            self.in_free_space = False

        kind = self.type
        if kind == "point":
            self.kind = EmitterTag.POINT
            pos_elem = elem.find("point")
            assert pos_elem is not None, f"point source <{self.id}> needs <point>"
            self.pos = vec3d_parse(pos_elem)
        elif kind == "area":
            self.kind = EmitterTag.AREA
            self.attached = True     # must be attached; enforced after parse
        elif kind in ("spot", "collimated"):
            self.kind = EmitterTag.SPOT if kind == "spot" else EmitterTag.COLLIMATED
            for p in elem.findall("point"):
                name = p.get("name")
                if name in ("position", "pos"):
                    self.pos = vec3d_parse(p)
                elif name in ("direction", "dir"):
                    d = vec3d_parse(p)
                    n = np.linalg.norm(d)
                    if n < 1e-5:
                        raise ValueError(f"Emitter <{self.id}>: bad direction")
                    self.dir = (d / n).astype(np.float32)
            if kind == "spot":
                self.r = float(np.cos(15.0 * DEG2RAD))
                for f in elem.findall("float"):
                    if f.get("name") == "half-angle":
                        self.r = float(np.cos(max(1e-3, get(f, "value")) * DEG2RAD))
            else:
                for f in elem.findall("float"):
                    if f.get("name") == "radius":
                        self.r = max(0.0, get(f, "value"))
                self.inv_area = 1.0 if self.r == 0 else INV_PI / (self.r * self.r)
        else:
            raise ValueError(f"Emitter type '{kind}' is not supported")

    @property
    def bool_bits(self) -> int:
        """Flag word layout matches reference abtract_source.py:47."""
        free = BIT_FREE_SPACE if self.in_free_space else 0
        if self.kind == EmitterTag.POINT:
            return BIT_POS_DELTA | free
        if self.kind == EmitterTag.AREA:
            return BIT_IS_AREA | free
        if self.kind == EmitterTag.SPOT:
            return BIT_POS_DELTA | free
        # collimated: pos-delta only when the beam radius is zero
        return (BIT_POS_DELTA if self.r == 0 else 0) | BIT_DIR_DELTA | free

    def __repr__(self):
        return (f"<{self.type} emitter id={self.id} I={self.intensity.tolist()} "
                f"attached={self.attached}>")


def parse_emitters(em_elems):
    """Parse all <emitter> nodes; returns (sources, id->index dict).

    Reference: xml_parser.py:66-87."""
    sources, id_map = [], {}
    for elem in em_elems:
        src = LightSource(elem)
        if src.id in id_map:
            raise ValueError(f"Duplicate emitter id '{src.id}'")
        id_map[src.id] = len(sources)
        sources.append(src)
    return sources, id_map
