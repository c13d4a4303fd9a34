"""BxDF mixtures: probabilistic combination of component materials.

Equivalent of the reference's `BxDFMixture` (bxdf/mixture.py:30-121), which
is dead code on the reference's main branch (only wired on branch `more`,
mixture.py:6-8). Mirrored here at the same integration level: the device
ops are implemented and tested, but the XML parser does not create
mixtures (no shipped scene uses them).

A mixture row holds up to four component material ids (rows into the scene
material tables) with sampling proportions. Sampling picks one component by
proportion and delegates; eval/pdf are proportion-weighted sums over the
present components.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import bxdf_ops
from .gather import tgather

N_COMPONENTS = 4     # diffuse / glossy / specular / transmit slots


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass
class MixtureTable:
    """Per-mixture component ids + proportions (reference mixture.py:30-45).

    comp_ids: (M, 4) i32 rows into the scene material tables (-1 = unused);
    probs: (M, 4) f32 sampling proportions (sum <= 1; remainder absorbs)."""
    comp_ids: jnp.ndarray
    probs: jnp.ndarray


def _component_mats(scene, mix, mix_id):
    """Per-lane MatParams for each of the 4 component slots."""
    ids = tgather(mix.comp_ids, mix_id)          # (N, 4)
    probs = tgather(mix.probs, mix_id)           # (N, 4)
    mats = [bxdf_ops.gather_mat(scene, jnp.maximum(ids[:, c], 0))
            for c in range(N_COMPONENTS)]
    present = ids >= 0
    return mats, probs, present


def mixture_eval(scene, cfg, mix, mix_id, it, incid, out, world_ior,
                 mode=bxdf_ops.TRANSPORT_UNI):
    """Proportion-weighted sum of component evals (mixture.py:62-80)."""
    mats, probs, present = _component_mats(scene, mix, mix_id)
    res = jnp.zeros((incid.shape[0], 3), jnp.float32)
    for c in range(N_COMPONENTS):
        ev = bxdf_ops.surface_eval(cfg, mats[c], it, incid, out, world_ior,
                                   mode)
        w = jnp.where(present[:, c], probs[:, c], 0.0)
        res = res + ev * w[:, None]
    return res


def mixture_pdf(scene, cfg, mix, mix_id, it, outdir, incid, world_ior):
    """Proportion-weighted pdf (mixture.py:99-121)."""
    mats, probs, present = _component_mats(scene, mix, mix_id)
    pdf = jnp.zeros(incid.shape[:1], jnp.float32)
    for c in range(N_COMPONENTS):
        p = bxdf_ops.surface_pdf(cfg, mats[c], it, outdir, incid, world_ior)
        pdf = pdf + jnp.where(present[:, c], probs[:, c] * p, 0.0)
    return pdf


def mixture_sample(scene, cfg, mix, mix_id, it, incid, u, world_ior,
                   mode=bxdf_ops.TRANSPORT_UNI):
    """Pick a component by proportion, delegate sampling, scale the pdf
    (mixture.py:46-60). Returns (dir, spec, pdf, is_specular); lanes whose
    pick falls in the absorbed remainder return zero spec."""
    N = incid.shape[0]
    mats, probs, present = _component_mats(scene, mix, mix_id)
    probs = jnp.where(present, probs, 0.0)
    cdf = jnp.cumsum(probs, axis=1)
    pick = u[:, 5]
    comp = (pick[:, None] >= cdf).sum(1)          # 4 => absorbed
    out = jnp.tile(jnp.array([0.0, 1.0, 0.0], jnp.float32), (N, 1))
    spec = jnp.zeros((N, 3), jnp.float32)
    pdf = jnp.ones((N,), jnp.float32)
    is_spec = jnp.zeros((N,), bool)
    for c in range(N_COMPONENTS):
        m = comp == c
        d, s, p, isp = bxdf_ops.surface_sample(cfg, mats[c], it, incid, u,
                                               world_ior, mode)
        out = jnp.where(m[:, None], d, out)
        spec = jnp.where(m[:, None], s, spec)
        pdf = jnp.where(m, p * probs[:, c], pdf)
        is_spec = jnp.where(m, isp, is_spec)
    return out, spec, pdf, is_spec
