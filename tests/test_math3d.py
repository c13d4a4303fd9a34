"""Host camera rotation (reference la/cam_transform.py:32-49)."""
import numpy as np

from adapt_tpu.ops.math3d import np_rotation_between


def test_rotation_between_basic():
    z = np.float32([0, 0, 1])
    for tgt in ([1, 0, 0], [0, 0.6, 0.8], [-0.5, 0.5, 0.7071]):
        t = np.float32(tgt) / np.linalg.norm(tgt)
        R = np_rotation_between(z, t)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5
        np.testing.assert_allclose(R @ z, t, atol=1e-5)


def test_rotation_between_antiparallel_is_proper():
    """A ~180-degree turn must be a proper yaw rotation, not -identity
    (det=-1 mirrors the film on both axes; reachable by yawing the
    scene_viz flythrough around)."""
    z = np.float32([0, 0, 1])
    up = np.float32([0, 1, 0])
    for tgt in ([1e-13, 0, -1], [0, 0, -1], [1e-6, -1e-7, -1]):
        t = np.float32(tgt) / np.linalg.norm(tgt)
        R = np_rotation_between(z, t)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5
        np.testing.assert_allclose(R @ z, [0, 0, -1], atol=1e-4)
        np.testing.assert_allclose(R @ up, up, atol=1e-5)  # no roll/flip
