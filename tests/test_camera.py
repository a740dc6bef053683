"""Camera ray-gen semantics (RayTracing.cu:9-24, Camera3D.cpp:8-98)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from rtwc_tpu.camera import (
    Camera,
    default_camera,
    basis,
    camera_rays,
    projection_elements,
    move,
    add_rot,
    Keys,
)
from rtwc_tpu.config import RenderConfig


def test_center_pixel_is_forward():
    # The ray of the exact center pixel must equal the forward vector
    # (cx = cy = 0 -> v = (0,0,1) -> B^T v = forward at the default pose).
    cfg = RenderConfig(width=100, height=50)
    cam = default_camera()
    e1, e2 = projection_elements(cfg)
    origin, dirs = camera_rays(cam, cfg.width, cfg.height, e1, e2)
    center = dirs[cfg.height // 2, cfg.width // 2]
    np.testing.assert_allclose(np.asarray(center), [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(origin), [0.0, 0.0, 0.0])


def test_rays_unit_norm():
    cfg = RenderConfig(width=64, height=32)
    cam = Camera(pos=jnp.array([1.0, 2.0, 3.0]), rot=jnp.array([0.3, 2.0, 0.0]))
    e1, e2 = projection_elements(cfg)
    _, dirs = camera_rays(cam, cfg.width, cfg.height, e1, e2)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(dirs, axis=-1)), 1.0, atol=1e-5)


def test_basis_orthonormal():
    rot = jnp.array([0.4, 1.3, 0.0])
    r, u, f = basis(rot)
    for a, b in [(r, u), (r, f), (u, f)]:
        assert abs(float(jnp.dot(a, b))) < 1e-6
    for v in (r, u, f):
        np.testing.assert_allclose(float(jnp.linalg.norm(v)), 1.0, atol=1e-6)


def test_projection_elements():
    cfg = RenderConfig(width=400, height=150, fov_divisor=1.5, aspect_coeff=0.01)
    e1, e2 = projection_elements(cfg)
    fov = math.pi / 1.5
    e = 1.0 / math.tan(fov / 2.0)
    aspect = 1.0 / (0.01 * 150)
    assert abs(e2 - e) < 1e-9
    assert abs(e1 - e / aspect) < 1e-9


def test_move_forward_default_pose():
    # Default pose yaw=pi: staticForward = (0, -cos(pi), -cos(pi)) = (0,1,1);
    # normalized (0, .707, .707); only x/z applied -> z += 0.707 * dt * speed.
    cam = default_camera()
    cam2 = move(cam, Keys(w=1), dt=1.0, speed=10.0)
    pos = np.asarray(cam2.pos)
    np.testing.assert_allclose(pos[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(pos[1], 0.0, atol=1e-5)  # y untouched by WASD
    np.testing.assert_allclose(pos[2], 10.0 / math.sqrt(2.0), rtol=1e-5)


def test_move_vertical():
    cam = default_camera()
    up = move(cam, Keys(space=1), dt=0.5, speed=10.0)
    np.testing.assert_allclose(np.asarray(up.pos), [0.0, 5.0, 0.0], atol=1e-6)
    down = move(cam, Keys(shift=1), dt=0.5, speed=10.0)
    np.testing.assert_allclose(np.asarray(down.pos), [0.0, -5.0, 0.0], atol=1e-6)


def test_add_rot_pitch_clamp():
    cam = default_camera()
    cam = add_rot(cam, dp=-10000.0, dy=0.0)  # huge upward pitch
    assert float(cam.rot[0]) <= math.pi / 2
    cam = add_rot(cam, dp=20000.0, dy=0.0)
    assert float(cam.rot[0]) >= -math.pi / 2


def test_rays_differentiable_wrt_pose():
    cfg = RenderConfig(width=16, height=8)
    e1, e2 = projection_elements(cfg)

    def f(rot):
        cam = Camera(pos=jnp.zeros(3), rot=rot)
        _, dirs = camera_rays(cam, cfg.width, cfg.height, e1, e2)
        return jnp.sum(dirs**2 * jnp.sin(dirs))

    g = jax.grad(f)(jnp.array([0.2, 2.5, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))
