"""Real-TPU kernel validation lane (VERDICT r2 item 7).

The pytest suite pins jax to a simulated 8-device CPU mesh (conftest.py),
so every Pallas test there runs in interpret mode. This script runs the
kernel-vs-jnp allclose checks on the REAL chip - compiled Mosaic, not the
interpreter - and prints the tolerances actually achieved, making the
"grads match on TPU to ~3e-4" claim reproducible with one command:

    python scripts/tpu_check.py          # needs the TPU visible to jax

Checks (golden strategy, SURVEY.md section 4):
  1. hard Pallas forward vs the jnp reference renderer (display path);
  2. fused soft forward vs render/softmin.py, shadows off and on;
  3. gradients of an MSE loss through the fused custom-VJP kernels vs
     jax.grad of the jnp soft renderer, per parameter group.

Exit code 0 iff every check passes its tolerance. One JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rel_err_p999(a, b):
    """99.9th-percentile relative error: a handful of silhouette-boundary
    pixels can legitimately flip between two f32 programs (a softmin
    weight crossing 0.5 under different op orderings), so the max over
    all pixels is the wrong statistic for forward images."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.maximum(np.abs(a), np.abs(b)), 1e-6)
    return float(np.percentile(np.abs(a - b) / denom, 99.9))


def abs_p999(a, b):
    d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    return float(np.percentile(d, 99.9))


def mean_abs(a, b):
    return float(np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def main() -> int:
    backend = jax.default_backend()
    if backend != "tpu":
        print(json.dumps({"ok": False, "error": f"needs a TPU, got {backend}"}))
        return 1

    from rtwc_tpu.camera import Camera, default_camera
    from rtwc_tpu.config import RenderConfig
    from rtwc_tpu.render import render_frame, render_frame_soft
    from rtwc_tpu.render.pallas_kernel import render_frame_pallas
    from rtwc_tpu.render.pallas_soft import render_frame_soft_pallas
    from rtwc_tpu.scene import random_scene

    results: dict = {"ok": True, "backend": backend,
                     "device": str(jax.devices()[0])}
    failures = []

    def check(name, value, tol):
        results[name] = value
        if value > tol:
            failures.append(f"{name}={value:.3e} > {tol:g}")

    cfg = RenderConfig(width=640, height=360, max_spheres=24, max_planes=4,
                       soft_miss_penalty=300.0, soft_mask_k=10.0)
    scene = random_scene(20, max_spheres=24, max_planes=4, seed=0)
    cam = Camera(pos=jnp.asarray(default_camera().pos),
                 rot=jnp.asarray(default_camera().rot))
    tau = 0.5

    # 1. hard display kernel vs jnp reference renderer (rgb is 0..255).
    fb_hard = render_frame_pallas(scene, cam, cfg)
    fb_ref = render_frame(scene, cam, cfg.replace(renderer="jnp"))
    check("hard_rgb_mean_abs", mean_abs(fb_hard.rgb, fb_ref.rgb), 0.02)
    check("hard_rgb_abs_p999", abs_p999(fb_hard.rgb, fb_ref.rgb), 1.0)
    check("hard_depth_rel_p999", rel_err_p999(fb_hard.depth, fb_ref.depth), 1e-3)

    # 2. fused soft forward vs softmin.py, shadows off and on.
    for shadows in (False, True):
        c = cfg.replace(shadows=shadows)
        fb_p = render_frame_soft_pallas(scene, cam, c, tau=tau)
        fb_j = render_frame_soft(scene, cam, c, tau=tau)
        tag = "sh" if shadows else "nosh"
        check(f"soft_{tag}_rgb_mean_abs", mean_abs(fb_p.rgb, fb_j.rgb), 0.05)
        check(f"soft_{tag}_rgb_abs_p999", abs_p999(fb_p.rgb, fb_j.rgb), 2.0)
        check(f"soft_{tag}_depth_rel_p999", rel_err_p999(fb_p.depth, fb_j.depth), 1e-3)

    # 3. gradients through the fused custom-VJP kernels vs jax.grad of the
    # jnp renderer (the differentiable-parity contract, BASELINE config 2).
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    csh = cfg.replace(shadows=True)

    def loss(render):
        def f(scene, cam):
            fb = render(scene, cam, csh, tau=tau)
            return (jnp.mean(((fb.rgb - target) / 255.0) ** 2)
                    + 0.01 * jnp.mean(fb.depth) / cfg.far)
        return f

    gp = jax.jit(jax.grad(loss(render_frame_soft_pallas), argnums=(0, 1)))(scene, cam)
    gj = jax.jit(jax.grad(loss(render_frame_soft), argnums=(0, 1)))(scene, cam)
    for name, a, b, tol in (
        ("grad_sphere_center_rel", gj[0].spheres.center, gp[0].spheres.center, 3e-3),
        ("grad_sphere_radius_rel", gj[0].spheres.radius, gp[0].spheres.radius, 3e-3),
        ("grad_sphere_color_rel", gj[0].spheres.color, gp[0].spheres.color, 3e-3),
        ("grad_plane_center_rel", gj[0].planes.center, gp[0].planes.center, 3e-3),
        ("grad_cam_pos_rel", gj[1].pos, gp[1].pos, 3e-3),
        # 2e-2 is the MEASURED intrinsic floor for this metric, not an
        # accumulation artifact: the kernel reduces the rotation
        # cotangents with an error-free two-float tree + Kahan cross-tile
        # carry (exact to ~1e-15 on-chip), and an f64 study
        # (scripts/cam_grad_precision.py) shows (a) the sums are
        # well-conditioned (~5-40) and (b) summing the f32 per-ray
        # cotangents EXACTLY still scatters ~2e-2: a sub-0.1% population
        # of silhouette rays resolves its softmin weights differently in
        # any two f32 programs. Each program computes the correct
        # gradient of its own f32 loss; the jnp and pallas paths agree to
        # ~1e-2 ON THE SAME HARDWARE (this check), while either hardware
        # vs f64 truth scatters further (the per-ray divergence scales
        # with the platform's transcendental ULPs).
        ("grad_cam_rot_rel", gj[1].rot, gp[1].rot, 2e-2),
    ):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
        check(name, float(np.max(np.abs(a - b)) / scale), tol)

    results["ok"] = not failures
    if failures:
        results["failures"] = failures
    print(json.dumps(results))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
