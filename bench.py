"""Headline benchmark: rays/sec/chip, forward + backward, 1080p, 20 spheres.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md: no README/docs/benchmarks),
so vs_baseline is reported against the target set in BASELINE.json rather
than a reference measurement: we normalize against a 60 FPS 1080p fwd+bwd
budget (1920*1080*60 ~ 124.4M rays/s), i.e. vs_baseline > 1 means the
differentiable renderer exceeds real-time 1080p training throughput on one
chip - a bar the interactive reference never attempts (its backward pass
does not exist).

The headline step runs the fused Pallas custom-VJP kernels
(render/pallas_soft.py): the soft-min over objects is computed online
inside the forward kernel and the backward kernel applies the closed-form
softmax VJP, so per-object intermediates never touch HBM. The jnp band
renderer (render/softmin.py via lax.map) is timed as a secondary number -
it is the semantic source of truth the kernels are validated against.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtwc_tpu.camera import camera_rays, default_camera, projection_elements
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render.softmin import trace_soft
from rtwc_tpu.render.pallas_kernel import render_frame_pallas
from rtwc_tpu.render.pallas_soft import render_frame_soft_pallas
from rtwc_tpu.scene import random_scene

WIDTH, HEIGHT = 1920, 1080
N_BANDS = 12  # 90 rows/band: [90, 1920, 25, 3] f32 intermediates ~ 52 MB
BASELINE_RAYS_PER_S = 1920 * 1080 * 60.0  # real-time 1080p fwd+bwd budget


def build_fwd_bwd_step(cfg: RenderConfig, tau: float = 0.5):
    """Headline step: MSE loss + grads through the fused Pallas kernels."""

    def loss_fn(params, target):
        scene, camera = params
        fb = render_frame_soft_pallas(scene, camera, cfg, tau=tau)
        return jnp.mean(((fb.rgb - target) / 255.0) ** 2)

    @jax.jit
    def step(params, target):
        return jax.value_and_grad(loss_fn)(params, target)

    return step


def build_fwd_bwd_step_jnp(cfg: RenderConfig, tau: float = 0.5):
    """Secondary: the jnp soft renderer in HBM-bounded row bands."""
    e1, e2 = projection_elements(cfg)
    rows_per = cfg.height // N_BANDS

    def loss_fn(params, target):
        scene, camera = params

        def band(row0):
            origin, dirs = camera_rays(
                camera, cfg.width, cfg.height, e1, e2,
                row_start=row0, n_rows=rows_per,
            )
            rgb, _, _, _ = trace_soft(scene, origin, dirs, cfg, tau=tau)
            return rgb

        row0s = jnp.arange(N_BANDS) * rows_per
        rgb = jax.lax.map(band, row0s).reshape(cfg.height, cfg.width, 3)
        return jnp.mean(((rgb - target) / 255.0) ** 2)

    @jax.jit
    def step(params, target):
        return jax.value_and_grad(loss_fn)(params, target)

    return step


def _sync(out) -> float:
    """True device sync: fetch one scalar to host. jax.block_until_ready is
    a no-op over the remote axon tunnel (verified: it 'timed' a 4k matmul
    at 3714 TFLOP/s), so a D2H read of a result element is the only honest
    barrier. Executions serialize on the device stream, so reading the
    last output waits for the whole queued batch."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def time_it(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    cfg = RenderConfig(
        width=WIDTH, height=HEIGHT, max_spheres=20, max_planes=4,
        soft_miss_penalty=300.0, soft_mask_k=10.0,
    )
    scene = random_scene(20, max_spheres=20, max_planes=4, seed=0)
    camera = default_camera()
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    step = build_fwd_bwd_step(cfg)
    dt = time_it(step, (scene, camera), target)
    rays_per_s = WIDTH * HEIGHT / dt

    # Secondary numbers (not the headline JSON): jnp fwd+bwd band renderer
    # and the pure forward Pallas kernel.
    jnp_dt = time_it(build_fwd_bwd_step_jnp(cfg), (scene, camera), target)
    fwd_fn = jax.jit(lambda s, c: render_frame_pallas(s, c, cfg).rgb)
    fwd_dt = time_it(fwd_fn, scene, camera)
    import sys

    print(
        f"# pallas fwd+bwd: {dt * 1e3:.2f} ms/frame ({rays_per_s / 1e6:.1f} Mrays/s) | "
        f"jnp fwd+bwd: {jnp_dt * 1e3:.2f} ms/frame "
        f"({WIDTH * HEIGHT / jnp_dt / 1e6:.1f} Mrays/s) | "
        f"pallas fwd: {fwd_dt * 1e3:.2f} ms/frame "
        f"({WIDTH * HEIGHT / fwd_dt / 1e6:.1f} Mrays/s) | "
        f"backend={jax.default_backend()} devices={jax.device_count()}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "rays/sec/chip fwd+bwd, 1080p, 20 spheres, soft renderer",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
