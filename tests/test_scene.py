"""Scene pytree semantics (Scene3D.cpp, Sphere.cu:15-23)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtwc_tpu.scene import (
    empty_scene,
    add_sphere,
    add_plane,
    default_scene,
    spawn_random_sphere,
    update_scene,
    save_scene,
    load_scene,
)
from rtwc_tpu.camera import default_camera


def test_default_scene_counts():
    s = default_scene()
    assert s.n_spheres == 5
    assert s.n_planes == 1
    # Exact seed values of Scene3D.cpp:28-33.
    np.testing.assert_allclose(np.asarray(s.spheres.center[0]), [0.0, 10.0, 20.0])
    np.testing.assert_allclose(float(s.spheres.radius[2]), 10.0)
    np.testing.assert_allclose(np.asarray(s.planes.center[0]), [0.0, -3.0, 30.0])
    np.testing.assert_allclose(float(s.planes.width[0]), 10.0)


def test_pool_full_refuses_silently():
    s = empty_scene(max_spheres=2, max_planes=1)
    for _ in range(5):
        s = add_sphere(s, 1.0, (0, 0, 0), (1, 1, 1), speed=1.0)
    assert s.n_spheres == 2  # same silent refusal as Scene3D.cpp:42-45
    assert s.spheres.capacity == 2  # shapes never change -> no recompiles


def test_add_does_not_change_shapes():
    s = empty_scene(max_spheres=8, max_planes=2)
    shapes0 = jax.tree.map(lambda x: x.shape, s)
    s = add_sphere(s, 1.0, (0, 0, 0), (1, 1, 1), speed=1.0)
    assert jax.tree.map(lambda x: x.shape, s) == shapes0


def test_spawn_random_sphere_bounds():
    rng = np.random.default_rng(0)
    s = empty_scene(max_spheres=8, max_planes=2)
    s = spawn_random_sphere(s, rng)
    assert s.n_spheres == 1
    c = np.asarray(s.spheres.center[0])
    assert (c >= -50).all() and (c < 50).all()
    assert 0 <= float(s.spheres.radius[0]) < 10


def test_bobbing_and_bounce():
    s = empty_scene(max_spheres=2, max_planes=1)
    s = add_sphere(s, 1.0, (0.0, 9.5, 0.0), (1, 1, 1), speed=2.0)
    # mover starts at -1 (Sphere.cu:9): moves down.
    s1 = update_scene(s, jnp.float32(0.25))
    assert float(s1.spheres.center[0, 1]) == 9.0
    # Push it past the lower bound: y clamps to -10 and direction flips.
    s2 = update_scene(s1, jnp.float32(100.0))
    assert float(s2.spheres.center[0, 1]) == -10.0
    assert float(s2.spheres.mover[0]) == 1.0
    s3 = update_scene(s2, jnp.float32(0.5))
    assert float(s3.spheres.center[0, 1]) == -9.0


def test_update_is_jittable_and_leaves_inactive_alone():
    s = empty_scene(max_spheres=4, max_planes=1)
    s = add_sphere(s, 1.0, (0.0, 0.0, 0.0), (1, 1, 1), speed=1.0)
    stepped = jax.jit(update_scene)(s, jnp.float32(0.1))
    assert float(stepped.spheres.center[1, 1]) == 0.0  # inactive slot untouched
    np.testing.assert_allclose(float(stepped.spheres.center[0, 1]), -0.1, rtol=1e-6)


def test_save_load_roundtrip(tmp_path):
    s = default_scene()
    cam = default_camera()
    path = str(tmp_path / "scene.npz")
    save_scene(path, s, cam)
    s2, cam2 = load_scene(path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), s, s2
    )
    np.testing.assert_array_equal(np.asarray(cam.pos), np.asarray(cam2.pos))
