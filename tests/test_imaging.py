"""Imaging utilities: quantile normalize, firefly clamp, tonemap/write,
transient curve analysis (reference utils/watermark.py, post_processing.py,
utils/tdom_analyze.py behavior contracts)."""
import numpy as np

from adapt_tpu.utils.imaging import (quantile_normalize, remove_fireflies,
                                     tonemap, write_image, apply_watermark)
from adapt_tpu.utils.tdom_analyze import time_domain_curve, analyze_peaks


def test_quantile_normalize():
    img = np.linspace(0.0, 2.0, 1000).reshape(10, 10, 10)
    out = quantile_normalize(img, 0.99)
    assert abs(np.quantile(out, 0.99) - 1.0) < 1e-6
    # q<=0 disables
    assert quantile_normalize(img, 0.0) is img


def test_remove_fireflies_clamps_isolated_outlier():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.4, (32, 32, 3)).astype(np.float32)
    img[16, 16] = 50.0                     # firefly
    out = remove_fireflies(img, thresh=1.5)
    assert out[16, 16].mean() < 1.0        # clamped to neighborhood
    # non-outlier pixels untouched
    mask = np.ones((32, 32), bool)
    mask[16, 16] = False
    assert np.array_equal(out[mask], img[mask])


def test_remove_fireflies_keeps_smooth_bright_regions():
    img = np.full((16, 16, 3), 5.0, np.float32)   # uniformly bright
    out = remove_fireflies(img, thresh=1.5)
    assert np.array_equal(out, img)


def test_tonemap_and_write(tmp_path):
    img = np.random.default_rng(1).uniform(0, 1, (8, 8, 3))
    u8 = tonemap(img)
    assert u8.dtype == np.uint8 and u8.max() <= 255
    p = str(tmp_path / "x.png")
    write_image(p, img)
    from PIL import Image
    back = np.asarray(Image.open(p))
    assert back.shape == (8, 8, 3)
    np.testing.assert_array_equal(back, u8)
    write_image(str(tmp_path / "x.npy"), img)
    np.testing.assert_allclose(np.load(str(tmp_path / "x.npy")), img,
                               rtol=1e-6)


def test_watermark_stamps_float_image():
    img = np.full((64, 256, 3), 0.25, np.float32)
    img[0, 0] = 1.0                      # image max sets the stamp color
    out = apply_watermark(img.copy())
    assert out.shape == img.shape
    changed = np.abs(out - img).max(-1) > 1e-3
    assert changed.any()                 # text drawn
    assert not changed[: img.shape[0] // 2].any()   # only the bottom strip


def test_time_domain_curve_and_peaks():
    # synthetic transient: gaussian pulse at bin 20 of 64
    T, H, W = 64, 16, 16
    t = np.arange(T, dtype=np.float32)
    pulse = np.exp(-0.5 * ((t - 20.0) / 2.0) ** 2)
    frames = np.ones((T, H, W, 3), np.float32) * pulse[:, None, None, None]
    for mode in ("diag", "whole"):
        curve = time_domain_curve(frames, window_mode=mode)
        assert curve.shape[0] == T
        assert abs(int(np.argmax(curve)) - 20) <= 1
    peaks = analyze_peaks(time_domain_curve(frames), interval=1.0)
    assert len(peaks) >= 1
    # FWHM of a sigma=2 gaussian is ~4.7 bins
    p = peaks[0]
    assert abs(p["time"] - 20.0) <= 1.0
    assert 2.0 < p["fwhm"] < 8.0
