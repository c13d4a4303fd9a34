"""Scene configurator / previewer (reference scene_viz.py, headless).

Renders a fast normal-shaded preview of a scene from the scene camera or a
CLI-overridden pose, writes the image, and prints the XML <lookat> line for
authoring. The reference's interactive GGUI sliders/WASD flythrough maps to
repeated invocations with --origin/--target (no display server on TPU pods).

    python scene_viz.py --scene cbox --name cbox.xml \
        --origin 2.78,2.73,-8 --target 2.78,2.73,-7
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if "--arch" not in sys.argv or "cpu" in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                          "axon"))

import numpy as np


def parse_vec(s):
    return np.array([float(x) for x in s.split(",")], np.float32)


def main():
    ap = argparse.ArgumentParser("adapt_tpu scene preview")
    ap.add_argument("--input_path", default="./scenes/")
    ap.add_argument("--scene", default="cbox")
    ap.add_argument("--name", default="cbox.xml")
    ap.add_argument("--origin", type=str, default=None,
                    help="camera origin 'x,y,z' (default: scene camera)")
    ap.add_argument("--target", type=str, default=None,
                    help="look-at target 'x,y,z'")
    ap.add_argument("--fov", type=float, default=0.0,
                    help="override field of view (degrees)")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--mode", choices=["normal", "depth", "direct"],
                    default="normal")
    ap.add_argument("--out", default="./outputs/scene_viz.png")
    ap.add_argument("--arch", default="cpu", choices=["cpu", "tpu"])
    opts = ap.parse_args()

    if opts.arch == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if opts.arch == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/adapt_tpu_jax"))
    import dataclasses
    import jax.numpy as jnp
    from adapt_tpu.scene.compile import load_scene
    from adapt_tpu.ops.math3d import np_rotation_between, fov2focal
    from adapt_tpu.ops.intersect import ray_intersect
    from adapt_tpu.renderer.base import camera_rays
    from adapt_tpu.utils.imaging import write_image

    scene, cfg, configs = load_scene(
        os.path.join(opts.input_path, opts.scene), opts.name)
    r = opts.res
    fov = opts.fov if opts.fov > 0 else configs["fov"]
    cfg = dataclasses.replace(cfg, w=r, h=r, focal=fov2focal(fov, r),
                              start_x=0, end_x=r, start_y=0, end_y=r,
                              anti_alias=False, stratified_sampling=False)

    if opts.origin is not None and opts.target is not None:
        origin = parse_vec(opts.origin)
        target = parse_vec(opts.target)
        direction = target - origin
        direction = direction / np.linalg.norm(direction)
        cam_r = np_rotation_between(np.float32([0, 0, 1]), direction)
        scene = dataclasses.replace(scene, cam_r=jnp.asarray(cam_r),
                                    cam_t=jnp.asarray(origin))
    else:
        origin = np.asarray(scene.cam_t)
        direction = np.asarray(scene.cam_r @ jnp.array([0., 0., 1.]))
        target = origin + direction

    ray_o, ray_d = camera_rays(scene, cfg, jax.random.PRNGKey(0),
                               jnp.int32(0))
    it = ray_intersect(scene, cfg, ray_o, ray_d)
    if opts.mode == "normal":
        img = np.asarray(jnp.where(it.is_hit[..., None],
                                   it.n_s * 0.5 + 0.5, 0.0))
    elif opts.mode == "depth":
        t = np.asarray(jnp.where(it.is_hit, it.t, 0.0))
        img = np.repeat((t / max(t.max(), 1e-6))[:, None], 3, -1)
    else:
        from adapt_tpu.renderer.direct import render_pass_direct
        img, _d, _n = render_pass_direct(scene, cfg, jax.random.PRNGKey(0),
                                         jnp.int32(0))
        img = np.asarray(img)
    frame = np.swapaxes(img.reshape(r, r, 3), 0, 1)[::-1]
    write_image(opts.out, frame, gamma=1.0 if opts.mode != "direct" else 2.2)
    print(f"preview written to {opts.out}")
    print("XML camera pose:")
    print(f'  <lookat target="{target[0]:.4g}, {target[1]:.4g}, '
          f'{target[2]:.4g}" origin="{origin[0]:.4g}, {origin[1]:.4g}, '
          f'{origin[2]:.4g}" up="0, 1, 0"/>')


if __name__ == "__main__":
    main()
