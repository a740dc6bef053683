"""Inverse rendering demo (BASELINE config 3): recover perturbed sphere
geometry and camera pose from a target image by gradient descent through
the fused Pallas fwd+bwd kernels.

The reference renderer (CUDA, RayTracing.cu) cannot do any of this - its
closest-hit logic is branch-hard. Here d(pixel)/d(geometry, pose) exists
everywhere (render/softmin.py design note), so fitting a scene to an image
is ~40 lines.

Usage:
    python examples/inverse_render.py [--steps 200] [--width 320] [--height 180]

Prints the loss curve and the final parameter errors; optionally renders
before/after ASCII previews with --preview.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rtwc_tpu.camera import Camera, default_camera
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render.pallas_soft import render_frame_soft_pallas
from rtwc_tpu.scene import add_plane, add_sphere, empty_scene


def build(width: int, height: int):
    cfg = RenderConfig(width=width, height=height, max_spheres=4, max_planes=2,
                       soft_miss_penalty=300.0, soft_mask_k=10.0)
    s = empty_scene(cfg.max_spheres, cfg.max_planes)
    s = add_sphere(s, 5.0, (0.0, 1.0, 22.0), (220.0, 50.0, 50.0), speed=1.0)
    s = add_sphere(s, 3.0, (-5.0, -1.0, 30.0), (50.0, 220.0, 50.0), speed=1.0)
    s = add_sphere(s, 4.0, (6.0, 2.0, 34.0), (50.0, 50.0, 220.0), speed=1.0)
    s = add_plane(s, (0.0, -4.0, 30.0), (0.0, 1.0, 0.0), (120.0, 120.0, 120.0), 80.0, 80.0)
    return cfg, s


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=3e-2)
    p.add_argument("--perturb", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg, true_scene = build(args.width, args.height)
    true_cam = Camera(pos=jnp.asarray(default_camera().pos),
                      rot=jnp.asarray(default_camera().rot))
    target = render_frame_soft_pallas(true_scene, true_cam, cfg, tau=args.tau).rgb
    target = jax.lax.stop_gradient(target)

    rng = np.random.default_rng(args.seed)
    live = np.asarray(true_scene.spheres.active) > 0.5
    noise = rng.normal(0, args.perturb, size=(cfg.max_spheres, 3)).astype(np.float32)
    noise[~live] = 0.0
    bad_scene = true_scene.replace(spheres=true_scene.spheres.replace(
        center=np.asarray(true_scene.spheres.center) + noise,
        radius=np.asarray(true_scene.spheres.radius) * np.where(live, 1.2, 1.0).astype(np.float32),
    ))
    bad_cam = true_cam.replace(rot=true_cam.rot + jnp.asarray([0.02, -0.03, 0.0]))

    def loss_fn(params):
        scene, cam = params
        fb = render_frame_soft_pallas(scene, cam, cfg, tau=args.tau)
        return jnp.mean(((fb.rgb - target) / 255.0) ** 2)

    # Train only centers/radii + camera rotation; freeze the rest.
    def labels(params):
        scene, cam = params
        slab = jax.tree.map(lambda _: "freeze", scene)
        clab = jax.tree.map(lambda _: "freeze", cam)
        slab = slab.replace(spheres=slab.spheres.replace(center="train", radius="train"))
        return (slab, clab.replace(rot="train"))

    opt = optax.multi_transform(
        {"train": optax.adam(args.lr), "freeze": optax.set_to_zero()}, labels)
    params = (bad_scene, bad_cam)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    loss0 = None
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if i == 0:
            loss0 = float(loss)
        if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}", flush=True)
    dt = time.perf_counter() - t0

    fit_scene, fit_cam = params
    live_idx = np.flatnonzero(live)
    cerr0 = np.abs(noise[live_idx]).max()
    cerr = np.abs(np.asarray(fit_scene.spheres.center)[live_idx]
                  - np.asarray(true_scene.spheres.center)[live_idx]).max()
    rerr = np.abs(np.asarray(fit_cam.rot) - np.asarray(true_cam.rot)).max()
    print(f"\n{args.steps} steps in {dt:.1f}s "
          f"({args.steps * cfg.width * cfg.height / dt / 1e6:.0f} Mrays/s fwd+bwd)")
    print(f"loss: {loss0:.6f} -> {float(loss):.6f}")
    print(f"max center error: {cerr0:.3f} -> {cerr:.3f}")
    print(f"max camera rot error: {rerr:.4f} rad")
    ok = float(loss) < 0.3 * loss0
    print("FIT OK" if ok else "FIT DID NOT CONVERGE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
