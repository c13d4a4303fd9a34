"""Scene-parse coverage over every shipped XML.

Scenes whose mesh assets are not in the repo must fail with a clear
missing-file error; everything else must parse. Missing texture images
degrade to untextured materials (warning) instead of failing.
"""
import os
import warnings

import pytest

from adapt_tpu.parsers.xml_parser import scene_parsing

from conftest import SCENE_DIR

ALL_SCENES = []
for suite in ("cbox", "csphere", "vpt", "trans"):
    d = os.path.join(SCENE_DIR, suite)
    for f in sorted(os.listdir(d)):
        if f.endswith(".xml"):
            ALL_SCENES.append((suite, f))

# scenes referencing mesh files that are not shipped in this repo
MISSING_MESHES = {
    "cbox-vn.xml", "ite-orb.xml", "kitchen.xml", "single-orb.xml",
    "skeleton.xml", "smaller.xml", "vader.xml", "venus.xml", "whiskey.xml",
    "foam.xml", "bvh-benchmark.xml", "bathroom.xml", "complex.xml",
    "bunny.xml",
}


@pytest.mark.parametrize("suite,name", ALL_SCENES)
def test_scene_parses(suite, name):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            emitters, array_info, objects, configs = scene_parsing(
                os.path.join(SCENE_DIR, suite), name)
        except FileNotFoundError:
            if name in MISSING_MESHES:
                pytest.skip("mesh assets not shipped")
            raise
    assert array_info["primitives"].shape[0] > 0
    assert len(objects) > 0
    assert "film" in configs and "transform" in configs
