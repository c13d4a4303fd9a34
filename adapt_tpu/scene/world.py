"""Host-side world record: skybox / ambient / free-space medium.

Reference: parsers/world.py:21-47.
"""
from __future__ import annotations

import numpy as np
import xml.etree.ElementTree as xet

from ..parsers.general import rgb_parse
from .medium import MediumRec


class WorldRec:
    def __init__(self, elem: xet.Element | None):
        self.skybox = np.zeros(3, np.float32)
        self.ambient = np.zeros(3, np.float32)
        self.medium = MediumRec(None if elem is None else elem.find("medium"))
        self.C = 1.0  # speed of light for transient rendering
        if elem is not None:
            for rgb_elem in elem.findall("rgb"):
                name = rgb_elem.get("name")
                if name in ("skybox", "ambient"):
                    setattr(self, name, rgb_parse(rgb_elem))

    def __repr__(self):
        return f"<World medium={self.medium!r} skybox={self.skybox.tolist()}>"
