"""Gradient correctness: finite-difference checks of the soft renderer
w.r.t. sphere centers/radii, plane normals/offsets, materials, and camera
extrinsics (the BASELINE.json metric: "grad allclose vs finite-diff")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtwc_tpu.camera import Camera, default_camera
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render import render_frame_soft
from rtwc_tpu.scene import add_plane, add_sphere, empty_scene

CFG = RenderConfig(width=48, height=32, max_spheres=4, max_planes=2)
TAU = 0.5  # soft enough for stable finite differences at eps=1e-3


def _scene():
    s = empty_scene(CFG.max_spheres, CFG.max_planes)
    s = add_sphere(s, 5.0, (0.0, 1.0, 20.0), (200.0, 40.0, 40.0), speed=1.0)
    s = add_sphere(s, 3.0, (-4.0, -1.0, 28.0), (40.0, 200.0, 40.0), speed=1.0)
    s = add_plane(s, (0.0, -3.0, 30.0), (0.0, 1.0, 0.0), (100.0, 100.0, 100.0), 60.0, 60.0)
    return s


def _loss_of(params_to_scene_cam):
    def loss(p):
        scene, cam = params_to_scene_cam(p)
        fb = render_frame_soft(scene, cam, CFG, tau=TAU)
        # mixed objective exercising color, depth and silhouette gradients
        return jnp.mean(fb.rgb / 255.0) + 0.01 * jnp.mean(fb.depth) / CFG.far
    return loss


def _check_fd(loss, p0, eps=1e-3, rtol=0.03, atol=5e-5, x64=True):
    """Central finite differences vs jax.grad, elementwise.

    With x64=True the FD probe runs the loss in float64 (the renderer is
    dtype-polymorphic), removing the fp32 roundoff floor that otherwise
    forces a large eps and silhouette-truncation error. The analytic grad
    under test stays fp32 - that is the deliverable being checked.
    """
    g = np.asarray(jax.grad(loss)(p0))
    p0 = np.asarray(p0, np.float64)
    fd = np.zeros_like(p0)
    it = np.nditer(p0, flags=["multi_index"])
    fd_dtype = jnp.float64 if x64 else jnp.float32
    import contextlib
    ctx = jax.enable_x64() if x64 else contextlib.nullcontext()
    with ctx:
        loss_j = jax.jit(loss)
        while not it.finished:
            i = it.multi_index
            pp, pm = p0.copy(), p0.copy()
            pp[i] += eps
            pm[i] -= eps
            fd[i] = (float(loss_j(jnp.asarray(pp, fd_dtype)))
                     - float(loss_j(jnp.asarray(pm, fd_dtype)))) / (2 * eps)
            it.iternext()
    scale = np.maximum(np.abs(fd), np.abs(g))
    bad = np.abs(fd - g) > (atol + rtol * scale)
    assert not bad.any(), f"grad mismatch:\nfd={fd}\ng={g}"


def test_grad_sphere_centers():
    base = _scene()

    def to_sc(centers):
        return base.replace(spheres=base.spheres.replace(center=centers)), default_camera()

    _check_fd(_loss_of(to_sc), base.spheres.center)


def test_grad_sphere_radii():
    base = _scene()

    def to_sc(r):
        return base.replace(spheres=base.spheres.replace(radius=r)), default_camera()

    _check_fd(_loss_of(to_sc), base.spheres.radius)


def test_grad_sphere_colors():
    base = _scene()

    def to_sc(c):
        return base.replace(spheres=base.spheres.replace(color=c)), default_camera()

    _check_fd(_loss_of(to_sc), base.spheres.color, eps=1e-2)


def test_grad_plane_normal_and_offset():
    base = _scene()

    def to_sc(p):
        normal, center = p[:3][None, :], p[3:][None, :]
        pl = base.planes.replace(
            normal=jnp.concatenate([normal, base.planes.normal[1:]]),
            center=jnp.concatenate([center, base.planes.center[1:]]),
        )
        return base.replace(planes=pl), default_camera()

    p0 = jnp.concatenate([base.planes.normal[0], base.planes.center[0]])
    _check_fd(_loss_of(to_sc), p0)


def test_grad_camera_extrinsics():
    # Camera rotation sweeps every silhouette across the screen, so finite
    # differences need the smooth annealing config (wide transition bands):
    # small miss penalty, soft hinge, large tau - the setting an inverse
    # renderer would start from.
    cfg = CFG.replace(soft_miss_penalty=100.0, soft_mask_k=5.0)
    base = _scene()

    def loss(p):
        cam = Camera(pos=p[:3], rot=p[3:])
        fb = render_frame_soft(base, cam, cfg, tau=2.0)
        return jnp.mean(fb.rgb / 255.0) + 0.01 * jnp.mean(fb.depth) / cfg.far

    p0 = jnp.concatenate([default_camera().pos, default_camera().rot])
    # x64 FD probe: fp32 roundoff would otherwise swamp the ~5e-4 rotation
    # gradients at any eps small enough to avoid silhouette truncation.
    _check_fd(loss, p0, eps=1e-4, atol=1e-4, x64=True)


def test_check_grads_api():
    """jax.test_util.check_grads (first order). Uses a smooth config (large
    tau, small miss penalty) because check_grads probes with larger steps
    than the silhouette transition width of the sharp default config."""
    from jax.test_util import check_grads

    cfg = CFG.replace(soft_miss_penalty=100.0, soft_mask_k=5.0)
    base = _scene()
    cam = default_camera()

    def f(centers, radius):
        scene = base.replace(spheres=base.spheres.replace(center=centers, radius=radius))
        fb = render_frame_soft(scene, cam, cfg, tau=2.0)
        return jnp.mean(fb.rgb / 255.0)

    check_grads(f, (base.spheres.center, base.spheres.radius), order=1,
                modes=["rev"], rtol=0.08, atol=1e-3, eps=1e-3)


def _shadow_scene():
    """Occluder between the light (1, 50, 0) and a ground plane: the plane
    under the sphere is in shadow."""
    s = empty_scene(4, 2)
    s = add_sphere(s, 4.0, (0.0, 8.0, 20.0), (200.0, 40.0, 40.0), speed=1.0)
    s = add_plane(s, (0.0, -3.0, 30.0), (0.0, 1.0, 0.0), (200.0, 200.0, 200.0), 100.0, 100.0)
    return s


def test_grad_shadows_sphere_center():
    """Finite-difference check THROUGH the soft shadow term: moving the
    occluder moves the shadow, so d(loss)/d(center) must include it."""
    cfg = CFG.replace(shadows=True, soft_shadow_k=5.0,
                      soft_miss_penalty=100.0, soft_mask_k=5.0)
    base = _shadow_scene()

    def loss(centers):
        scene = base.replace(spheres=base.spheres.replace(center=centers))
        fb = render_frame_soft(scene, default_camera(), cfg, tau=1.0)
        return jnp.mean(fb.rgb / 255.0)

    _check_fd(loss, base.spheres.center, eps=1e-3, rtol=0.03, atol=1e-5)


def test_soft_shadow_darkens_and_converges_to_hard():
    """The soft shadowed forward must (a) darken shadowed ground pixels vs
    the unshadowed render and (b) converge to the hard shadowed image as
    tau -> 0 and the occlusion sigmoids sharpen."""
    from rtwc_tpu.render import render_frame

    base = _shadow_scene()
    cam = default_camera()
    sharp = CFG.replace(shadows=True, soft_shadow_k=500.0)
    hard = render_frame(base, cam, sharp)
    soft = render_frame_soft(base, cam, sharp, tau=0.02)
    lit = render_frame_soft(base, cam, CFG.replace(shadows=False), tau=0.02)

    hard_rgb = np.asarray(hard.rgb)
    soft_rgb = np.asarray(soft.rgb)
    hit = np.asarray(hard.hit)
    # shadowed pixels exist: hard shadow image darker than unshadowed somewhere
    darker = (np.asarray(lit.rgb).sum(-1) - soft_rgb.sum(-1)) > 30.0
    assert darker.sum() > 50, "expected a visible shadow region"
    # soft ~= hard away from silhouettes: median error small
    err = np.abs(soft_rgb - hard_rgb)[hit]
    assert np.median(err) < 2.0, np.median(err)


def test_grads_finite_with_shadows():
    cfg = CFG.replace(shadows=True)
    base = _shadow_scene()
    cam = default_camera()

    def loss(scene, cam):
        fb = render_frame_soft(scene, cam, cfg, tau=0.05)
        return jnp.mean(fb.rgb) + jnp.mean(fb.depth)

    gs, gc = jax.grad(loss, argnums=(0, 1))(base, cam)
    for leaf in jax.tree.leaves((gs, gc)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_grads_finite_everywhere():
    base = _scene()
    cam = default_camera()

    def loss(scene, cam):
        fb = render_frame_soft(scene, cam, CFG, tau=0.05)
        return jnp.mean(fb.rgb) + jnp.mean(fb.depth)

    gs, gc = jax.grad(loss, argnums=(0, 1))(base, cam)
    for leaf in jax.tree.leaves((gs, gc)):
        assert np.isfinite(np.asarray(leaf)).all()
