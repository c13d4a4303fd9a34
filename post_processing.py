"""Firefly removal post-process CLI (reference post_processing.py:14-45).

Conservative 3x3 outlier clamp: pixels whose luminance exceeds a threshold
times the brightest neighbor are replaced by the neighborhood median.

    python post_processing.py --input outputs/pbr.png --thresh 1.5
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from adapt_tpu.utils.imaging import remove_fireflies, write_image


def main():
    ap = argparse.ArgumentParser("adapt_tpu firefly removal")
    ap.add_argument("--input", required=True, help="image (.png/.npy)")
    ap.add_argument("--output", default="",
                    help="output path (default: <input>-clean)")
    ap.add_argument("--thresh", type=float, default=1.5,
                    help="luminance ratio vs brightest neighbor")
    ap.add_argument("--passes", type=int, default=1)
    opts = ap.parse_args()

    if opts.input.endswith(".npy"):
        img = np.load(opts.input).astype(np.float32)
        gamma = 1.0
    else:
        try:
            import cv2
            img = cv2.imread(opts.input)[..., ::-1].astype(np.float32) / 255
        except ImportError:
            from PIL import Image
            img = np.asarray(Image.open(opts.input).convert("RGB"),
                             np.float32) / 255
        gamma = 1.0  # already display-encoded

    before = img
    for _ in range(max(opts.passes, 1)):
        img = remove_fireflies(img, opts.thresh)
    changed = int((np.abs(before - img).max(-1) > 1e-6).sum())

    root, ext = os.path.splitext(opts.input)
    out = opts.output or f"{root}-clean{ext}"
    write_image(out, img, gamma=gamma)
    print(f"{changed} firefly pixels cleaned -> {out}")


if __name__ == "__main__":
    main()
