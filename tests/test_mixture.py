"""BxDF mixture ops: estimator consistency with directly-weighted components.

Mirrors the reference's mixture semantics (bxdf/mixture.py, dead code on
its main branch): E[sample] must integrate the proportion-weighted eval.
"""
import numpy as np
import jax
import jax.numpy as jnp

from adapt_tpu.ops import mixture_ops, bxdf_ops
from adapt_tpu.ops.mixture_ops import MixtureTable

from test_bxdf import make_mat, make_it, Cfg, fixed_incid, BRDF_XML

N = 40_000


class FakeScene:
    """Just enough of SceneData for gather_mat."""

    def __init__(self, recs):
        import xml.etree.ElementTree as xet
        from adapt_tpu.scene.bxdf import parse_bxdf_node
        import numpy as np
        parsed = [parse_bxdf_node(xet.fromstring(x)) for x in recs]
        self.mat_type = jnp.asarray([r.type_id for r in parsed])
        self.mat_is_bsdf = jnp.zeros(len(parsed), bool)
        self.mat_is_delta = jnp.asarray([r.is_delta for r in parsed])
        self.mat_kd = jnp.asarray(np.stack([r.k_d for r in parsed]))
        self.mat_ks = jnp.asarray(np.stack([r.k_s for r in parsed]))
        self.mat_kg = jnp.asarray(np.stack([r.k_g for r in parsed]))
        self.mat_mean = jnp.asarray(np.stack([r.mean for r in parsed]))

        class Med:
            ior = jnp.ones(len(parsed))
        self.medium = Med()
        self.obj_emitter = jnp.full(len(parsed), -1, jnp.int32)


def test_mixture_sample_matches_weighted_eval():
    scene = FakeScene([BRDF_XML["lambertian"], BRDF_XML["microfacet"]])
    mix = MixtureTable(
        comp_ids=jnp.asarray([[0, 1, -1, -1]], jnp.int32),
        probs=jnp.asarray([[0.6, 0.4, 0.0, 0.0]], jnp.float32))
    it = make_it(N)
    incid = fixed_incid(N)
    mix_id = jnp.zeros((N,), jnp.int32)
    u = jax.random.uniform(jax.random.PRNGKey(0), (N, 6))

    out, spec, pdf, _ = mixture_ops.mixture_sample(
        scene, Cfg, mix, mix_id, it, incid, u, 1.0)
    # Reference semantics (mixture.py:56-89): sample returns the chosen
    # component's own spec with pdf scaled by its proportion, so
    # E[spec/pdf] = SUM of component reflectances (unweighted), while eval
    # is the proportion-WEIGHTED sum. Assert both, separately.
    w = np.asarray(spec) / np.maximum(np.asarray(pdf), 1e-9)[:, None]
    est = w.mean(0)

    k = jax.random.PRNGKey(1)
    from adapt_tpu.ops.sampling import cosine_hemisphere
    uu = jax.random.uniform(k, (N, 2))
    d, cpdf = cosine_hemisphere(uu[:, 0], uu[:, 1])
    # unweighted sum of component reflectances
    ref_unweighted = np.zeros(3)
    for c in range(2):
        m = bxdf_ops.gather_mat(scene, jnp.full((N,), c, jnp.int32))
        ev_c = bxdf_ops.surface_eval(Cfg, m, it, incid, d, 1.0)
        ref_unweighted += (np.asarray(ev_c)
                           / np.asarray(cpdf)[:, None]).mean(0)
    assert np.abs(est - ref_unweighted).max() < 0.06, (est, ref_unweighted)

    # eval is the weighted sum
    ev = mixture_ops.mixture_eval(scene, Cfg, mix, mix_id, it, incid, d, 1.0)
    ref_w = np.zeros(3)
    for c, p in ((0, 0.6), (1, 0.4)):
        m = bxdf_ops.gather_mat(scene, jnp.full((N,), c, jnp.int32))
        ref_w += p * np.asarray(bxdf_ops.surface_eval(Cfg, m, it, incid, d,
                                                      1.0)).mean(0)
    assert np.abs(np.asarray(ev).mean(0) - ref_w).max() < 1e-3

    # pdf function integrates to the total sampling mass over the hemisphere
    p = mixture_ops.mixture_pdf(scene, Cfg, mix, mix_id, it, d, incid, 1.0)
    mass = float((np.asarray(p) / np.asarray(cpdf)).mean())
    assert 0.5 < mass <= 1.05, mass


# ===================== end-to-end parse -> render path =====================

_SCENE_TMPL = """<?xml version='1.0' encoding='utf-8'?>
<scene version="1.1">
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <integer name="max_bounce" value="{max_bounce}"/>
    <integer name="num_shadow_ray" value="1"/>
    <boolean name="use_rr" value="false"/>
    <boolean name="anti_alias" value="false"/>
    <boolean name="stratified_sampling" value="false"/>
    <boolean name="use_mis" value="true"/>
    <transform name="toWorld">
      <lookat target="0, 0, 1" origin="0, 0, -4" up="0, 1, 0"/>
    </transform>
    <film type="film">
      <integer name="width" value="32"/>
      <integer name="height" value="32"/>
    </film>
  </sensor>
  <emitter type="point" id="point">
    <rgb name="emission" value="40.0, 40.0, 40.0"/>
    <rgb name="scaler" value="1.0"/>
    <point name="center" x="0" y="3" z="-2"/>
  </emitter>
  {materials}
  <shape type="sphere">
    <point name="center" x="0" y="0" z="0.5"/>
    <float name="radius" value="1.2"/>
    <ref type="material" id="ball"/>
  </shape>
  <world name="w">
    <rgb name="skybox" value="0.0"/>
    <rgb name="ambient" value="0.0"/>
  </world>
</scene>
"""


def _render_pt(tmp_path, name, materials, max_bounce=3, spp=2):
    from adapt_tpu import load_scene
    from adapt_tpu.renderer.pt import Renderer
    d = tmp_path / name
    d.mkdir()
    (d / "scene.xml").write_text(
        _SCENE_TMPL.format(materials=materials, max_bounce=max_bounce))
    scene, cfg, _ = load_scene(str(d), "scene.xml")
    r = Renderer(scene, cfg)
    for _ in range(spp):
        r.render()
    return scene, np.asarray(r.image())


def test_mixture_e2e_single_component_reduction(tmp_path):
    """A mixture with one diffuse component at p_d=1 is the SAME estimator
    as the plain component (reference mixture.py:55-85: pick always lands
    on it, pdf *= 1, eval weights by 1) — same-seed renders must agree to
    float tolerance, through the full parse -> compile -> render path."""
    plain = """
  <brdf type="lambertian" id="ball">
    <rgb name="k_d" value="0.7, 0.5, 0.3"/>
  </brdf>"""
    mixed = """
  <brdf type="lambertian" id="base">
    <rgb name="k_d" value="0.7, 0.5, 0.3"/>
  </brdf>
  <brdf type="mixture" id="ball">
    <ref name="diffuse" id="base"/>
    <float name="p_d" value="1.0"/>
  </brdf>"""
    scene_a, img_a = _render_pt(tmp_path, "plain", plain)
    scene_b, img_b = _render_pt(tmp_path, "mixed", mixed)
    assert scene_a.mixture is None
    assert scene_b.mixture is not None
    assert img_a.max() > 0.01
    assert np.allclose(img_a, img_b, atol=1e-5), \
        np.abs(img_a - img_b).max()


def test_mixture_e2e_two_lambertians_direct_blend(tmp_path):
    """Direct lighting (max_bounce=1: emission + NEE only) of a 50/50
    two-lambertian mixture equals a single lambertian with the blended
    albedo: NEE evaluates the proportion-weighted mixture eval
    (mixture.py:91-106) and lambertian NEE consumes identical RNG, so the
    same-seed images agree to float tolerance."""
    blended = """
  <brdf type="lambertian" id="ball">
    <rgb name="k_d" value="0.5, 0.4, 0.5"/>
  </brdf>"""
    mixed = """
  <brdf type="lambertian" id="a">
    <rgb name="k_d" value="0.8, 0.2, 0.6"/>
  </brdf>
  <brdf type="lambertian" id="b">
    <rgb name="k_d" value="0.2, 0.6, 0.4"/>
  </brdf>
  <brdf type="mixture" id="ball">
    <ref name="diffuse" id="a"/>
    <ref name="glossy" id="b"/>
    <float name="p_d" value="0.5"/>
    <float name="p_g" value="0.5"/>
  </brdf>"""
    _, img_a = _render_pt(tmp_path, "blend", blended, max_bounce=1)
    _, img_b = _render_pt(tmp_path, "mix2", mixed, max_bounce=1)
    assert img_a.max() > 0.01
    assert np.allclose(img_a, img_b, atol=1e-5), \
        np.abs(img_a - img_b).max()


def test_mixture_parse_validation():
    import pytest
    import xml.etree.ElementTree as xet
    from adapt_tpu.scene.bxdf import parse_bxdf_node, Mixture_np

    with pytest.raises(ValueError, match="unknown component"):
        parse_bxdf_node(xet.fromstring(
            '<brdf type="mixture" id="m"><ref name="shiny" id="x"/></brdf>'))
    with pytest.raises(ValueError, match="no components"):
        parse_bxdf_node(xet.fromstring('<brdf type="mixture" id="m"/>'))
    with pytest.raises(ValueError, match="sum to"):
        parse_bxdf_node(xet.fromstring(
            '<brdf type="mixture" id="m"><ref name="diffuse" id="x"/>'
            '<float name="p_d" value="0.8"/>'
            '<float name="p_g" value="0.5"/></brdf>'))

    mix = parse_bxdf_node(xet.fromstring(
        '<brdf type="mixture" id="m"><ref name="diffuse" id="x"/>'
        '<float name="p_d" value="1.0"/></brdf>'))
    assert isinstance(mix, Mixture_np)
    # unknown component id
    with pytest.raises(KeyError):
        mix.resolve({})
    # mixture-in-mixture is rejected
    with pytest.raises(ValueError, match="itself a mixture"):
        mix.resolve({"x": mix})
    # transmit slot requires a BSDF
    lam = parse_bxdf_node(xet.fromstring(
        '<brdf type="lambertian" id="l"><rgb name="k_d" value="0.5"/>'
        '</brdf>'))
    bad = parse_bxdf_node(xet.fromstring(
        '<brdf type="mixture" id="m2"><ref name="transmit" id="l"/>'
        '<float name="p_t" value="1.0"/></brdf>'))
    with pytest.raises(ValueError, match="needs a BSDF"):
        bad.resolve({"l": lam})
