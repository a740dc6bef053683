"""Device-mesh sharding of the renderer.

The reference is single-process / single-GPU: its only notion of scale is
the 2-D CUDA launch grid over pixels (RayTracingManager.cu:120-134). The
TPU-native scaling axis (SURVEY.md section 5, BASELINE configs 4-5) is the
same one, lifted across chips: shard the ray/tile dimension (image rows)
over a 1-D mesh, replicate the tiny scene (<= a few hundred objects x
32 B), and psum/pmean the scene-parameter gradients across chips during
the backward pass. Collectives ride ICI within a slice and DCN across
hosts. The compiled schedule (OVERLAP_r05.json, scripts/overlap_check.py)
fuses every gradient leaf into ONE step-level sync all-reduce right after
the one-pass fwd+bwd kernel: with KB-scale gradient tables emitted
atomically at kernel retirement there is nothing to overlap and ~us of
ICI latency nothing worth hiding - negligible-by-design beats
overlapped-by-scheduler.

Everything mesh-related lives in this one module so the rest of the
framework stays mesh-agnostic (SURVEY.md section 5 design note).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtwc_tpu.camera import Camera, camera_rays, projection_elements
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render.reference import Framebuffer, shade, trace_hard
from rtwc_tpu.render.softmin import trace_soft
from rtwc_tpu.scene import Scene

TILE_AXIS = "tiles"
# Per-sub-band cap on the jnp soft renderer's [rows, W, n_obj, 3] shading
# intermediates inside the sharded train step (see make_sharded_train_step).
_JNP_CHUNK_BYTES = 128 * 2**20


def make_mesh(n_devices: int | None = None, axis_name: str = TILE_AXIS) -> Mesh:
    """1-D mesh over all (or the first n) addressable devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _check_divisible(height: int, n: int) -> int:
    if height % n:
        raise ValueError(
            f"height {height} must divide by mesh size {n} for tile sharding "
            f"(pad the image or change the mesh)"
        )
    return height // n


@functools.lru_cache(maxsize=32)
def _make_render_sharded(config: RenderConfig, mesh: Mesh, backend: str):
    n = mesh.shape[TILE_AXIS]
    rows_per = _check_divisible(config.height, n)
    e1, e2 = projection_elements(config)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend not in ("jnp", "pallas"):
        raise ValueError(f"unknown sharded-render backend {backend!r}")

    def band(scene: Scene, camera: Camera) -> Framebuffer:
        tile = jax.lax.axis_index(TILE_AXIS)
        row0 = tile * rows_per
        if backend == "pallas":
            # Fused hard kernel (render/pallas_kernel.py) with the band
            # hook: the fast display path scales across the mesh at kernel
            # speed, not jnp speed.
            from rtwc_tpu.render import pack as _pack
            from rtwc_tpu.render.pallas_kernel import (
                hard_band_packed, planes_to_framebuffer,
            )

            sph, pl_, counts = _pack.pack_scene(scene)
            cam = _pack.pack_camera(camera)
            out = hard_band_packed(sph, pl_, counts.reshape(1, 2), cam, row0,
                                   config=config, band_h=rows_per)
            return planes_to_framebuffer(out, config, rows_per)
        origin, dirs = camera_rays(
            camera, config.width, config.height, e1, e2, row_start=row0, n_rows=rows_per
        )
        t, normal, color, shading = trace_hard(scene, origin, dirs)
        rgb = shade(scene, origin, dirs, t, normal, color, config)
        hit = t <= config.far
        return Framebuffer(rgb=rgb, normal=normal, depth=t, shading=shading, hit=hit,
                           coverage=hit.astype(jnp.float32),
                           alpha=hit.astype(jnp.float32))

    fn = shard_map(
        band,
        mesh=mesh,
        in_specs=(P(), P()),            # scene + camera replicated
        out_specs=jax.tree.map(lambda _: P(TILE_AXIS), Framebuffer(0, 0, 0, 0, 0, 0, 0)),
        # pallas_call can't annotate varying-mesh-axes on its out_shape yet.
        check_vma=False,
    )
    return jax.jit(fn)


def render_frame_sharded(
    scene: Scene, camera: Camera, config: RenderConfig, mesh: Mesh,
    backend: str = "auto",
) -> Framebuffer:
    """Tile-sharded forward render: each device renders its band of image
    rows against the replicated scene. Output framebuffer leaves are
    sharded over rows; per-pixel values match the single-device render to
    the last bits (validated in tests/test_dist.py). backend="auto" runs
    the fused hard Pallas kernel per band on TPU and the jnp renderer
    elsewhere; "pallas"/"jnp" force (pallas interprets off-TPU). The
    jitted program is cached per (config, mesh, backend)."""
    return _make_render_sharded(config, mesh, backend)(scene, camera)


def make_sharded_train_step(
    config: RenderConfig,
    mesh: Mesh,
    tau: float,
    optimizer=None,
    loss_scale: float = 1.0 / 255.0,
    backend: str = "jnp",
    animate: bool = False,
    interpret: bool | None = None,
) -> Callable:
    """Build the jitted multi-chip inverse-rendering train step
    (BASELINE configs 4-5; the train_step analogue of Engine3D::Run).

    Each device: renders its row band with the soft differentiable renderer,
    computes the local MSE against its shard of the target image, and
    back-propagates to the *replicated* scene + camera parameters; gradients
    are pmean-reduced over the mesh in one fused step-level all-reduce
    after the backward kernel (see module docstring + OVERLAP_r05.json:
    KB payload, ~us on ICI, nothing to overlap by design). Returns
    step(params, opt_state, target, dt=0.0) -> (params, opt_state, loss).
    params = (scene, camera).

    animate=True ticks the sphere physics (scene.update_scene: the bob
    kernel of RayTracingManager.cu:10-44 / Sphere.cu:15-23) by the traced
    `dt` argument inside the step, before rendering - BASELINE config 4's
    "animated scene" in the sharded train loop. The tick is replicated
    (objects are tiny) and differentiable, so gradients flow through it to
    the base scene parameters.

    interpret forces the pallas backend's kernel mode: None (default)
    auto-selects per jax.default_backend(); False forces real Mosaic
    lowering - needed when AOT-compiling for an abstract TPU topology
    (scripts/overlap_check.py) where no executable backend exists.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-2)

    n = mesh.shape[TILE_AXIS]
    rows_per = _check_divisible(config.height, n)
    e1, e2 = projection_elements(config)

    if backend not in ("jnp", "pallas"):
        raise ValueError(f"unknown train-step backend {backend!r}")

    def local_loss(params, target_band, dt):
        scene, camera = params
        if animate:
            from rtwc_tpu.scene import update_scene

            scene = update_scene(scene, dt, config.bob_min_y, config.bob_max_y)
        tile = jax.lax.axis_index(TILE_AXIS)
        row0 = tile * rows_per
        if backend == "pallas":
            # Fused fwd+bwd kernels (render/pallas_soft.py): each device
            # renders its band from packed tables; the custom VJP returns
            # table grads that chain through pack_scene/pack_camera here.
            from rtwc_tpu.render import pack as _pack
            from rtwc_tpu.render.pallas_soft import (
                C_NPL, C_NSPH, SO_B, SO_R, soft_band_mse_loss,
                soft_band_packed,
            )

            sph, pl_, counts = _pack.pack_scene(scene)
            cam = _pack.pack_camera(camera)
            cam = cam.at[0, C_NSPH].set(counts[0].astype(jnp.float32))
            cam = cam.at[0, C_NPL].set(counts[1].astype(jnp.float32))
            if loss_scale == 1.0 / 255.0:
                # Standard MSE scaling: take the fused-loss path (the MSE
                # cotangents are derived inside the backward kernel, no
                # HBM cotangent stack; parity with the generic path is
                # pinned by tests/test_pallas_soft.py).
                return soft_band_mse_loss(sph, pl_, cam, row0, target_band,
                                          config=config, tau=tau,
                                          band_h=rows_per,
                                          interpret=interpret)
            out = soft_band_packed(sph, pl_, cam, row0, config=config,
                                   tau=tau, band_h=rows_per,
                                   interpret=interpret)
            rgb = jnp.moveaxis(out[SO_R: SO_B + 1], 0, -1)
        else:
            # jnp renderer: sub-band the rows so the [r, W, n_obj, 3]
            # shading intermediates stay bounded at config-5 scale (4K,
            # 200 spheres would otherwise materialize ~300 GB), and
            # jax.checkpoint each sub-band so reverse-mode stores only the
            # sub-band inputs and recomputes the forward - the classic
            # remat trade of FLOPs for HBM.
            n_obj = config.max_spheres + config.max_planes
            bytes_per_row = config.width * n_obj * 3 * 4
            sub = max(1, min(rows_per, _JNP_CHUNK_BYTES // max(1, bytes_per_row)))
            while rows_per % sub:
                sub -= 1

            def sub_band(r0):
                origin, dirs = camera_rays(
                    camera, config.width, config.height, e1, e2,
                    row_start=r0, n_rows=sub
                )
                rgb, _, _, _ = trace_soft(scene, origin, dirs, config, tau=tau)
                return rgb

            if sub == rows_per:
                rgb = sub_band(row0)
            else:
                r0s = row0 + jnp.arange(rows_per // sub) * sub
                rgb = jax.lax.map(jax.checkpoint(sub_band), r0s).reshape(
                    rows_per, config.width, 3)
        err = (rgb - target_band) * loss_scale
        return jnp.mean(err * err)

    def shard_step(params, target_band, dt):
        loss, grads = jax.value_and_grad(local_loss)(params, target_band, dt)
        # Replicated params -> gradients must be averaged across the mesh.
        grads = jax.lax.pmean(grads, TILE_AXIS)
        loss = jax.lax.pmean(loss, TILE_AXIS)
        return loss, grads

    sharded_grads = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, target, dt=0.0):
        loss, grads = sharded_grads(params, target, jnp.asarray(dt, jnp.float32))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(params):
        return optimizer.init(params)

    step.init = init
    return step
