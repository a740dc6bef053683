"""All-dark shadow early-out ablation (dev tool; VERDICT r4 next #7).

Measures the fused shadowed train step with the early-out enabled
(production _VIS_EARLY_OUT) and disabled (threshold forced below any
reachable vis, kernels rebuilt), on (a) an adversarial heavily-shadowed
scene - a giant sphere occluder first in list order over a dense
mutually-occluding cluster - and (b) the lightly-shadowed headline
scene where the early-out must cost nothing.

Measured (v5e, r5): 1.03x on the dark cluster scene, ~1.00x (noise) on
lit scenes. The honest reading: the depth-bounded broad phase and the
per-ray constraint gates already remove most of the work full darkness
would skip, and the backward pass (exact gating, no early-out - its
gradients are needed regardless of vis saturation... strictly its
cotangents also vanish at the floor, but its cost is dominated by
RELEVANT occluders' vjps, which darkness does not make irrelevant)
dominates dark-scene cost. The early-out is kept because it is free,
parity-neutral, and guards the pathological long-list case.

Run on the real TPU: python benchmarks/earlyout_ablation.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rtwc_tpu.camera import default_camera
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render import pallas_soft
from rtwc_tpu.scene import add_plane, add_sphere, random_scene
from rtwc_tpu.render.pallas_soft import render_soft_mse_loss

W, H, K = 1920, 1080, 16


def sync(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def time_step(cfg, scene, camera, target, iters=4):
    @jax.jit
    def run(params, tgt):
        def body(carry, _):
            p = carry
            loss, grads = jax.value_and_grad(
                lambda q: render_soft_mse_loss(q[0], q[1], tgt, cfg,
                                               tau=0.5))(p)
            p = jax.tree.map(lambda a, g: a - 1e-6 * g, p, grads)
            return p, loss

        _, losses = jax.lax.scan(body, params, None, length=K)
        return losses[-1]

    for _ in range(1):
        sync(run((scene, camera), target))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run((scene, camera), target)
    sync(out)
    return (time.perf_counter() - t0) / iters / K


def main() -> int:
    cfg = RenderConfig(width=W, height=H, max_spheres=34, max_planes=4,
                       shadows=True, soft_miss_penalty=300.0,
                       soft_mask_k=10.0)
    camera = default_camera()
    target = jnp.zeros((H, W, 3), jnp.float32)

    # Heavily shadowed worst case for the shadow sweeps: a GIANT sphere
    # occluder (index 0 - shadow lists are index-ordered, so it runs
    # first and drives every ray's vis to the floor) over a DENSE
    # cluster whose members all sit in each other's shadow hulls (long
    # per-tile occluder lists). Without the early-out every listed
    # cluster member still runs its shadow solve; with it the whole
    # tail is skipped. (A fully-blocking PLANE is cheap either way:
    # planes are a handful and now run before the sphere list.)
    import numpy as np

    rng = np.random.default_rng(7)
    dark = add_sphere(
        random_scene(0, max_spheres=34, max_planes=4, seed=0),
        16.0, (0.0, 26.0, 28.0), (90.0, 90.0, 90.0), speed=1.0)
    for _ in range(30):
        dark = add_sphere(
            dark, float(rng.uniform(1.5, 3.0)),
            (float(rng.uniform(-6, 6)), float(rng.uniform(-3, 3)),
             float(rng.uniform(20, 36))),
            tuple(float(c) for c in rng.uniform(30, 220, 3)), speed=1.0)
    lit = random_scene(20, max_spheres=34, max_planes=4, seed=0)

    results = {}
    for label, thresh in (("early_out_on", pallas_soft._VIS_EARLY_OUT),
                          ("early_out_off", -1.0)):
        pallas_soft._VIS_EARLY_OUT = thresh
        pallas_soft._build_soft_packed.cache_clear()
        results[label] = {
            "dark_ms": time_step(cfg, dark, camera, target) * 1e3,
            "lit_ms": time_step(cfg, lit, camera, target) * 1e3,
        }
    pallas_soft._VIS_EARLY_OUT = 1e-7
    pallas_soft._build_soft_packed.cache_clear()

    on, off = results["early_out_on"], results["early_out_off"]
    print(f"heavily shadowed: {on['dark_ms']:.3f} ms with early-out vs "
          f"{off['dark_ms']:.3f} ms without ({off['dark_ms']/on['dark_ms']:.2f}x)")
    print(f"lightly shadowed: {on['lit_ms']:.3f} ms with vs "
          f"{off['lit_ms']:.3f} ms without "
          f"(overhead {on['lit_ms']/off['lit_ms']:.3f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
