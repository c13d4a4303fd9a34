#!/usr/bin/env python
"""Gallery artifact: density-grid recovery by gradient descent through
the ratio-tracking estimator (tests/test_grad_volume.py, run at gallery
scale). Writes gallery/volume_recovery.png: mid-slice of the initial,
recovered, and true density fields plus the loss curve.

Run on CPU: JAX_PLATFORMS=cpu PYTHONPATH= python scripts/recover_volume.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from adapt_tpu.ops import volume_ops
    volume_ops.DIFF_STEPS = 64
    import test_grad_volume as T

    ro, rd = T._rays(4096, seed=2)
    true = T._true_grid()
    key0 = jax.random.PRNGKey(11)

    def loss(raw, key):
        g = jax.nn.sigmoid(raw) * T.BOUND
        est = T._tr(g, ro, rd, key)
        tgt = T._tr(jax.lax.stop_gradient(true), ro, rd, key)
        return jnp.mean((est - tgt) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    raw = jnp.zeros((T.R,) * 3, jnp.float32) - 1.0
    init = np.asarray(jax.nn.sigmoid(raw) * T.BOUND)
    opt = optax.adam(0.15)
    st = opt.init(raw)
    curve = []
    for step in range(300):
        ls, g = vg(raw, jax.random.fold_in(key0, step))
        up, st = opt.update(g, st)
        raw = raw + up
        curve.append(float(ls))
        if step % 50 == 0:
            print(f"step {step}: loss {float(ls):.2e}", flush=True)
    rec = np.asarray(jax.nn.sigmoid(raw) * T.BOUND)
    t = np.asarray(true)
    print("mean abs err", np.abs(rec - t).mean(), "peak", t.max())

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    z = T.R // 2
    fig, axes = plt.subplots(1, 4, figsize=(13, 3.2), dpi=120)
    for ax, (img, title) in zip(axes[:3], [
            (init[z], "initial (constant)"),
            (rec[z], "recovered (300 Adam steps)"),
            (t[z], "ground truth")]):
        im = ax.imshow(img, vmin=0, vmax=t.max(), cmap="magma")
        ax.set_title(title, fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.colorbar(im, ax=axes[2], fraction=0.046)
    axes[3].semilogy(curve, lw=1.0)
    axes[3].set_title("CRN loss", fontsize=9)
    axes[3].set_xlabel("step")
    fig.suptitle("density-grid recovery through ratio tracking "
                 f"(mid z-slice, {T.R}^3 grid)", fontsize=10)
    fig.tight_layout()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gallery", "volume_recovery.png")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
