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
