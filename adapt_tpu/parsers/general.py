"""Low-level XML element parsers (host side, numpy).

Behavioral parity with reference parsers/general_parser.py (get :13, parse_str
:17, rgb_parse :28, vec3d_parse :48, transform_parse :56, sphere :100), but
implemented independently on numpy + scipy.
"""
from __future__ import annotations

import numpy as np
import xml.etree.ElementTree as xet
from scipy.spatial.transform import Rotation as Rot


def get(node: xet.Element, name: str, _type=float):
    """Fetch an attribute with '0' as the to-be-converted default."""
    return _type(node.get(name, "0"))


def parse_str(val_str: str, scalar_broadcast: bool = True) -> np.ndarray:
    """Parse 'a,b,c' / 'a b c' / scalar-broadcast strings into float32 arrays."""
    for sep in (",", " "):
        if sep in val_str:
            return np.array([float(p.strip()) for p in val_str.split(sep)],
                            dtype=np.float32)
    if not scalar_broadcast:
        raise ValueError(
            f"Expected a vector (',' or space separated), got '{val_str}'")
    return np.full(3, float(val_str.strip()), dtype=np.float32)


def rgb_parse(elem: xet.Element) -> np.ndarray:
    """Parse an <rgb> element: value string, '#rrggbb' hex, or r/g/b attrs."""
    if elem is None:
        raise ValueError("rgb_parse got a None element")
    val_str = elem.get("value")
    if val_str is None:
        if elem.get("r") is not None:
            return np.array([get(elem, "r"), get(elem, "g"), get(elem, "b")],
                            dtype=np.float32)
        raise ValueError("RGB element has neither 'value' nor r/g/b attributes")
    if val_str.startswith("#"):
        return np.array([int(val_str[1 + 2 * i:3 + 2 * i], 16) / 255.0
                         for i in range(3)], dtype=np.float32)
    return parse_str(val_str)


def vec3d_parse(elem: xet.Element) -> np.ndarray:
    """Parse a <point> element with x/y/z attrs or a value string."""
    if elem.tag != "point":
        raise ValueError(f"vec3d_parse expects a <point>, got <{elem.tag}>")
    if elem.get("value") is None:
        return np.array([get(elem, "x"), get(elem, "y"), get(elem, "z")],
                        dtype=np.float32)
    return parse_str(elem.get("value"), scalar_broadcast=False)


def transform_parse(transform_elem: xet.Element):
    """Parse a <transform> block into (rotation, translation, scale).

    Rotation conventions mirror the reference (parsers/general_parser.py:56-98):
    intrinsic 'zxy' euler (roll, pitch, yaw in degrees), quaternion, angle-axis.
    A <lookat> child instead yields (direction_vector, origin, None) — the
    camera transform case, where trans_r is a unit direction, not a matrix.
    """
    trans_r, trans_t, trans_s = None, None, None
    for child in transform_elem:
        tag = child.tag.lower()
        if tag == "translate":
            trans_t = np.array([get(child, "x"), get(child, "y"), get(child, "z")],
                               dtype=np.float32)
        elif tag == "rotate":
            rot_type = child.get("type", "euler")
            if rot_type == "euler":
                angles = (get(child, "r"), get(child, "p"), get(child, "y"))
                trans_r = Rot.from_euler("zxy", angles, degrees=True).as_matrix()
            elif rot_type == "quaternion":
                quat = [get(child, "x"), get(child, "y"), get(child, "z"),
                        get(child, "w")]
                trans_r = Rot.from_quat(quat).as_matrix()
            elif rot_type == "angle-axis":
                axis = np.array([get(child, "x"), get(child, "y"), get(child, "z")],
                                dtype=np.float32)
                ang = get(child, "angle")
                if abs(ang) < 1e-9 or np.linalg.norm(axis) < 1e-9:
                    raise ValueError(
                        "angle-axis rotation needs a nonzero 'angle' and "
                        "axis (a zero here would silently produce a NaN "
                        "rotation and black renders)")
                # Matches the reference formula verbatim (general_parser.py:78):
                # the axis is divided by (norm * angle_rad), i.e. rotvec length
                # is 1/angle_rad. Kept for scene-behavior parity.
                axis /= np.linalg.norm(axis) * ang / 180.0 * np.pi
                trans_r = Rot.from_rotvec(axis).as_matrix()
            else:
                raise ValueError(f"Unsupported rotation type '{rot_type}'")
        elif tag == "scale":
            trans_s = np.array([get(child, "x"), get(child, "y"), get(child, "z")],
                               dtype=np.float32)
        elif tag == "lookat":
            target = parse_str(child.get("target"))
            origin = parse_str(child.get("origin"))
            direction = target - origin
            norm = np.linalg.norm(direction)
            if norm < 1e-5:
                raise ValueError("lookat target and origin coincide")
            trans_r = direction / norm
            trans_t = origin
        else:
            raise ValueError(f"Unsupported transform child '{child.tag}'")
    return trans_r, trans_t, trans_s


def parse_sphere_element(elem: xet.Element):
    """Parse a sphere <shape>: returns ((1,2,3) [center;radius-row], normal)."""
    info = np.zeros((1, 2, 3), dtype=np.float32)
    info[0, 0] = vec3d_parse(elem.find("point"))
    radius = get(elem.find("float"), "value")
    info[0, 1] = radius
    return info, np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
