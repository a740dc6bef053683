"""Tile-size sweep for the fused Pallas soft fwd+bwd kernels (dev tool).

Times the headline 1080p/20-sphere step at several (bh, bw) block shapes,
plus the fwd-only kernel, to pick the defaults in render/pallas_soft.py.
Run on the real TPU: python benchmarks/tune_soft.py
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
from rtwc_tpu.render.pallas_soft import (render_frame_soft_pallas,
                                         render_soft_mse_loss)
from rtwc_tpu.scene import random_scene

WIDTH, HEIGHT = 1920, 1080


def sync(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def time_it(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    # Headline configuration: SHADOWED fused-MSE train step (bench.py).
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_spheres=20, max_planes=4,
                       soft_miss_penalty=300.0, soft_mask_k=10.0, shadows=True)
    scene = random_scene(20, max_spheres=20, max_planes=4, seed=0)
    camera = default_camera()
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    rays = WIDTH * HEIGHT

    # Amortized timing (K calls in ONE dispatch): the tunnel dispatch
    # floor (~2.5 ms, high variance) would otherwise swamp the <10%
    # differences being tuned (same methodology as bench.py).
    K = 16
    shapes = [(64, 128), (80, 128), (96, 128), (128, 128),
              (64, 256), (96, 256), (160, 128), (192, 128)]
    for bh, bw in shapes:
        @jax.jit
        def jfwd(scene, camera):
            def body(i, acc):
                cam = camera.replace(pos=camera.pos + i * 1e-7)
                fb = render_frame_soft_pallas(scene, cam, cfg, tau=0.5,
                                              bh=bh, bw=bw)
                return acc + fb.rgb[0, 0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        @jax.jit
        def jstep(params, tgt):
            def body(carry, _):
                p = carry
                loss, grads = jax.value_and_grad(
                    lambda p: render_soft_mse_loss(p[0], p[1], tgt, cfg,
                                                   tau=0.5, bh=bh, bw=bw))(p)
                p = jax.tree.map(lambda a, g: a - 1e-6 * g, p, grads)
                return p, loss
            _, losses = jax.lax.scan(body, params, None, length=K)
            return losses[-1]

        try:
            tf = time_it(jfwd, scene, camera) / K
            tb = time_it(jstep, (scene, camera), target) / K
        except Exception as e:
            print(f"bh={bh:3d} bw={bw:4d}  FAILED: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
            continue
        print(f"bh={bh:3d} bw={bw:4d}  fwd {tf*1e3:7.2f} ms ({rays/tf/1e6:7.1f} Mray/s)"
              f"   fwd+bwd {tb*1e3:7.2f} ms ({rays/tb/1e6:7.1f} Mray/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
