"""Tile-kernel film splat vs the scatter-add reference (exact up to f32
reassociation — the same class of difference as the r3 sorted-scatter
rewrite it replaces)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adapt_tpu.ops import splat_pallas


@pytest.fixture(autouse=True)
def _interpret():
    old = splat_pallas._INTERPRET
    splat_pallas._INTERPRET = jax.default_backend() != "tpu"
    yield
    splat_pallas._INTERPRET = old


def _scatter_ref(film, idx, r, g, b):
    out = np.array(film, np.float64)
    P = out.shape[0]
    for i, px in enumerate(np.asarray(idx)):
        if 0 <= px < P:
            out[px, 0] += float(r[i])
            out[px, 1] += float(g[i])
            out[px, 2] += float(b[i])
    return out


def _make_stream(key, P, M, drop_frac=0.1):
    ks = jax.random.split(key, 5)
    idx = jax.random.randint(ks[0], (M,), 0, P)
    # a sorted stream with a `drop` tail, as the BDPT caller produces
    drop = jax.random.uniform(ks[1], (M,)) < drop_frac
    idx = jnp.where(drop, P, idx)
    idx = jnp.sort(idx)
    r = jax.random.uniform(ks[2], (M,))
    g = jax.random.uniform(ks[3], (M,))
    b = jax.random.uniform(ks[4], (M,))
    return idx.astype(jnp.int32), r, g, b


@pytest.mark.parametrize("P,M", [(4096, 30000), (2048, 500)])
def test_splat_matches_scatter(P, M):
    film = jax.random.uniform(jax.random.PRNGKey(9), (P, 3))
    idx, r, g, b = _make_stream(jax.random.PRNGKey(1), P, M)
    out = np.asarray(splat_pallas.splat_sorted_accumulate(
        film, idx, r, g, b))
    ref = _scatter_ref(film, idx, r, g, b)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_splat_skewed_stream_falls_back():
    """One supertile holding > MAX_WIN updates must still be correct
    (the wrapper's lax.cond takes the scatter branch)."""
    P = splat_pallas.SUPER_PX * 2
    M = splat_pallas.MAX_WIN + 512
    film = jnp.zeros((P, 3), jnp.float32)
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (M,), 0,
                                      splat_pallas.SUPER_PX))
    r = jnp.ones((M,)) * 0.25
    out = np.asarray(splat_pallas.splat_sorted_accumulate(
        film, idx.astype(jnp.int32), r, r, r))
    ref = _scatter_ref(film, idx, r, r, r)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert out[splat_pallas.SUPER_PX:].sum() == 0.0


def test_splat_all_dropped():
    P = splat_pallas.SUPER_PX
    film = jax.random.uniform(jax.random.PRNGKey(2), (P, 3))
    idx = jnp.full((640,), P, jnp.int32)
    z = jnp.ones((640,))
    out = np.asarray(splat_pallas.splat_sorted_accumulate(
        film, idx, z, z, z))
    np.testing.assert_array_equal(out, np.asarray(film))


def test_splat_indivisible_film_uses_scatter():
    P = 777     # not SUPER_PX-divisible
    film = jnp.zeros((P, 3), jnp.float32)
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(4), (1024,),
                                      0, P)).astype(jnp.int32)
    o = jnp.ones((1024,))
    out = np.asarray(splat_pallas.splat_sorted_accumulate(
        film, idx, o, o, o))
    ref = _scatter_ref(film, idx, o, o, o)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bdpt_pass_tile_splat_integration(monkeypatch):
    """Full BDPT pass: tile-kernel splats == scatter splats (CPU
    interpret; exact up to f32 reassociation in the per-pixel sums)."""
    import dataclasses
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.bdpt import render_pass_bdpt
    from conftest import SCENE_DIR
    scene, cfg, _ = load_scene(SCENE_DIR + "/cbox/", "cbox.xml")
    cfg = dataclasses.replace(cfg, w=32, h=32, focal=cfg.focal * 32 / 512,
                              end_x=32, end_y=32, max_bounce=4)
    key = jax.random.PRNGKey(11)
    monkeypatch.setenv("ADAPT_TILE_SPLAT", "0")
    base = np.asarray(render_pass_bdpt(scene, cfg, key,
                                       jnp.int32(1))[0])
    monkeypatch.setenv("ADAPT_TILE_SPLAT", "1")
    jax.clear_caches()      # the env knob is read at trace time
    tiled = np.asarray(render_pass_bdpt(scene, cfg, key,
                                        jnp.int32(1))[0])
    np.testing.assert_allclose(tiled, base, rtol=2e-5, atol=2e-5)
