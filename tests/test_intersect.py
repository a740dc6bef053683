"""Closed-form intersection cases mirroring the branch structure of
Sphere.cu:41-60 and Plane.cu:47-57 (SURVEY.md section 4 test strategy)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtwc_tpu.scene import empty_scene, add_sphere, add_plane
from rtwc_tpu.render import intersect_spheres, intersect_planes
from rtwc_tpu.render.reference import MISS_DISTANCE


def _one_sphere(center, radius):
    s = empty_scene(max_spheres=4, max_planes=2)
    return add_sphere(s, radius, center, (255.0, 0.0, 0.0), speed=1.0)


def _one_plane(center, normal, w, h):
    s = empty_scene(max_spheres=4, max_planes=2)
    return add_plane(s, center, normal, (100.0, 100.0, 100.0), w, h)


ORIGIN = jnp.zeros(3)
FWD = jnp.array([0.0, 0.0, 1.0])


class TestSphere:
    def test_through_center(self):
        # Ray through the center: t = distance - radius.
        s = _one_sphere((0.0, 0.0, 20.0), 7.0)
        t, valid = intersect_spheres(ORIGIN, FWD, s.spheres)
        assert bool(valid[0])
        np.testing.assert_allclose(float(t[0]), 13.0, rtol=1e-5)

    def test_tangent_hits(self):
        # Grazing ray: discriminant == 0 counts as a hit (disc < 0 is the
        # only reject in Sphere.cu:42-45).
        s = _one_sphere((0.0, 3.0, 20.0), 3.0)
        t, valid = intersect_spheres(ORIGIN, FWD, s.spheres)
        assert bool(valid[0])
        np.testing.assert_allclose(float(t[0]), 20.0, rtol=1e-3)

    def test_miss(self):
        s = _one_sphere((0.0, 10.0, 20.0), 3.0)
        t, valid = intersect_spheres(ORIGIN, FWD, s.spheres)
        assert not bool(valid[0])
        assert float(t[0]) == float(np.float32(MISS_DISTANCE))

    def test_inside_is_miss(self):
        # Origin inside the sphere: t2 < 0 -> miss (Sphere.cu:55-60).
        s = _one_sphere((0.0, 0.0, 0.0), 5.0)
        t, valid = intersect_spheres(ORIGIN, FWD, s.spheres)
        assert not bool(valid[0])

    def test_behind_is_miss(self):
        s = _one_sphere((0.0, 0.0, -20.0), 5.0)
        t, valid = intersect_spheres(ORIGIN, FWD, s.spheres)
        assert not bool(valid[0])

    def test_inactive_slot_is_miss(self):
        s = empty_scene(max_spheres=4, max_planes=2)
        t, valid = intersect_spheres(ORIGIN, FWD, s.spheres)
        assert not bool(valid.any())

    def test_batched_rays(self):
        s = _one_sphere((0.0, 0.0, 20.0), 7.0)
        dirs = jnp.stack([FWD, jnp.array([0.0, 1.0, 0.0])])
        t, valid = intersect_spheres(ORIGIN, dirs, s.spheres)
        assert t.shape == (2, 4)
        assert bool(valid[0, 0]) and not bool(valid[1, 0])


class TestPlane:
    def test_hit_from_above(self):
        s = _one_plane((0.0, -3.0, 0.0), (0.0, 1.0, 0.0), 10.0, 20.0)
        o = jnp.array([0.0, 0.0, 0.0])
        d = jnp.array([0.0, -1.0, 0.0])
        t, valid = intersect_planes(o, d, s.planes)
        assert bool(valid[0])
        np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)

    def test_backface_reject(self):
        # Ray hitting the underside (d.n > 0) is rejected (Plane.cu:47).
        s = _one_plane((0.0, 3.0, 0.0), (0.0, 1.0, 0.0), 10.0, 20.0)
        t, valid = intersect_planes(ORIGIN, jnp.array([0.0, 1.0, 0.0]), s.planes)
        assert not bool(valid[0])

    def test_parallel_reject(self):
        s = _one_plane((0.0, -3.0, 0.0), (0.0, 1.0, 0.0), 10.0, 20.0)
        t, valid = intersect_planes(ORIGIN, FWD, s.planes)
        assert not bool(valid[0])

    def test_extent_clamp(self):
        # width bounds x, height bounds z (Plane.cu:59-68).
        s = _one_plane((0.0, -3.0, 0.0), (0.0, 1.0, 0.0), 10.0, 20.0)
        o_in = jnp.array([4.9, 0.0, 9.9])
        o_out_x = jnp.array([5.1, 0.0, 0.0])
        o_out_z = jnp.array([0.0, 0.0, 10.1])
        down = jnp.array([0.0, -1.0, 0.0])
        assert bool(intersect_planes(o_in, down, s.planes)[1][0])
        assert not bool(intersect_planes(o_out_x, down, s.planes)[1][0])
        assert not bool(intersect_planes(o_out_z, down, s.planes)[1][0])

    def test_behind_reject(self):
        s = _one_plane((0.0, 3.0, 0.0), (0.0, 1.0, 0.0), 10.0, 20.0)
        # Plane above, ray pointing down: t < 0.
        t, valid = intersect_planes(ORIGIN, jnp.array([0.0, -1.0, 0.0]), s.planes)
        assert not bool(valid[0])
