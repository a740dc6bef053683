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
from rtwc_tpu.render.pallas_soft import render_frame_soft_pallas
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
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_spheres=20, max_planes=4,
                       soft_miss_penalty=300.0, soft_mask_k=10.0)
    scene = random_scene(20, max_spheres=20, max_planes=4, seed=0)
    camera = default_camera()
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    rays = WIDTH * HEIGHT

    shapes = [(8, 640), (16, 640), (24, 640), (32, 640), (40, 640),
              (16, 512), (32, 512), (8, 1920), (16, 1920), (16, 128)]
    for bh, bw in shapes:
        def fwd(s, c):
            return render_frame_soft_pallas(s, c, cfg, tau=0.5, bh=bh, bw=bw).rgb

        def step(params, tgt):
            def loss(p):
                fb = render_frame_soft_pallas(p[0], p[1], cfg, tau=0.5, bh=bh, bw=bw)
                return jnp.mean(((fb.rgb - tgt) / 255.0) ** 2)
            return jax.value_and_grad(loss)(params)

        jfwd = jax.jit(fwd)
        jstep = jax.jit(step)
        try:
            tf = time_it(jfwd, scene, camera)
            tb = time_it(jstep, (scene, camera), target)
        except Exception as e:
            print(f"bh={bh:3d} bw={bw:4d}  FAILED: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
            continue
        print(f"bh={bh:3d} bw={bw:4d}  fwd {tf*1e3:7.2f} ms ({rays/tf/1e6:7.1f} Mray/s)"
              f"   fwd+bwd {tb*1e3:7.2f} ms ({rays/tb/1e6:7.1f} Mray/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
