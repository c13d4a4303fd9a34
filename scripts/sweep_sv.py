#!/usr/bin/env python
"""Candidates/ray vs the majorant bound, swept over supervoxel size.

VERDICT r4 #3: the rgbvol attribution says 78% of device time is
per-lane density gathers and "beating it requires fewer candidates
(tighter majorants)". The expected number of collision candidates along
a ray is the LINE INTEGRAL of the (piecewise-constant) local-majorant
field; the information-theoretic floor is the line integral of the true
density (any unbiased null-collision tracker must propose at least the
real-collision rate). Both are computable on the HOST from the grid —
no device instrumentation needed.

For each supervoxel size S this prints, over the shipped tornado camera
rays: mean candidates/ray (majorant integral), the true-density floor,
and the slack ratio. Pure numpy; run anywhere. The render-time A/B for
the chosen S runs on chip via ADAPT_SV_CAP + scripts/bench_all.py.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import numpy as np
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.renderer.base import camera_rays
    from adapt_tpu.ops import volume_ops
    import jax
    import jax.numpy as jnp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sdir = os.environ.get("SDIR", "cbox")
    xml = os.environ.get("SCENE", "cbox-rgbvol.xml")
    scene, cfg, _ = load_scene(os.path.join(here, "scenes", sdir), xml)
    vol = scene.volume
    dens = np.asarray(vol.grid)                    # (3, Z, Y, X)
    _, Z, Y, X = dens.shape
    print(f"{xml}: grid {Z}x{Y}x{X}, global majorant "
          f"{np.asarray(vol.majorant)}", flush=True)

    # camera rays in LOCAL voxel coords (subsample for speed)
    ro, rd = camera_rays(scene, cfg, jax.random.PRNGKey(0), jnp.int32(0))
    ro = np.asarray(ro)[:: 64]
    rd = np.asarray(rd)[:: 64]
    lo = (ro - np.asarray(vol.trans)[None, :]) @ np.asarray(vol.inv_T).T
    ld = rd @ np.asarray(vol.inv_T).T

    # dense sampling of the line integrals (march at 0.5-voxel steps)
    ext = np.array([X, Y, Z], np.float32)
    safe = np.where(np.abs(ld) < 1e-9, 1e-9, ld)
    t1 = (0.0 - lo) / safe
    t2 = (ext[None] - lo) / safe
    near = np.maximum(np.minimum(t1, t2).max(-1), 0.0)
    far = np.maximum(np.maximum(t1, t2).min(-1), near)
    n_steps = 2048
    ts = near[:, None] + (far - near)[:, None] \
        * (np.arange(n_steps)[None] + 0.5) / n_steps
    dt = (far - near) / n_steps                     # per-ray step length
    pos = lo[:, None, :] + ts[..., None] * ld[:, None, :]   # (R, S, 3)
    idx = np.clip(pos.astype(np.int64), 0,
                  np.array([X - 1, Y - 1, Z - 1]))
    inb = ((pos >= 0) & (pos < ext[None, None, :])).all(-1)
    # channel 0 (the tracker picks one channel; ratios are channel-alike)
    d_true = dens[0, idx[..., 2], idx[..., 1], idx[..., 0]] * inb
    floor = (d_true.sum(1) * dt)
    crossing = far > near + 1e-6
    print(f"rays crossing the grid: {crossing.mean():.3f}; "
          f"true-density candidates/crossing-ray floor: "
          f"{floor[crossing].mean():.2f}", flush=True)

    for cap in (4, 8, 16, 32):
        os.environ["ADAPT_SV_CAP"] = str(cap)
        volume_ops.SV_AXIS_CAP = cap
        S, sv = volume_ops._supervoxel_majorants(jnp.asarray(dens))
        svi = np.clip(idx // S,
                      0, np.array(sv.shape[1:][::-1]) - 1)  # (x,y,z) dims
        m = sv[0, svi[..., 2], svi[..., 1], svi[..., 0]] * inb
        cand = (m.sum(1) * dt)[crossing].mean()
        rows = 3 * sv.shape[1] * sv.shape[2]
        print(f"  S={S:3d} (cap {cap:2d}, sv grid "
              f"{sv.shape[3]}x{sv.shape[2]}x{sv.shape[1]}, one-hot rows "
              f"{rows}): candidates/ray {cand:8.2f} "
              f"(slack x{cand / max(floor[crossing].mean(), 1e-9):.1f})",
              flush=True)


if __name__ == "__main__":
    main()
