"""Pure-jnp reference renderer: the semantic source of truth.

This is the vectorized re-derivation of the reference's hot path
(RayTracing.cu:81-168 RayTrace + Sphere.cu:30-68 / Plane.cu:38-73
intersections + RayTracing.cu:41-79 BlinnPhongShading). Where one CUDA
thread loops over N polymorphic objects, here the whole (H, W) ray grid
intersects all objects at once as batched array ops: two per-type
intersection calls + a minimum-combine replace the virtual-dispatch
type switch (Object3D.h:43,57-59).

Everything is jittable with static shapes; XLA fuses ray-gen, intersection,
closest-hit select, and shading into one kernel. The Pallas path
(render/pallas_kernel.py) must match this renderer allclose - that is the
golden/differential test strategy (SURVEY.md section 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rtwc_tpu.camera import Camera, camera_rays, projection_elements
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.mathx import dot, normalize, safe_normalize, pytree_dataclass
from rtwc_tpu.scene import Scene, Planes, Spheres

# The reference's "no hit" sentinel distance (RayTracing.h:21).
MISS_DISTANCE = 99999999.0
# FloatEquals epsilon for the plane parallel-ray reject (MyMath.cu:44-47).
_FLT_EPSILON = 1.1920929e-07


@pytree_dataclass
class Framebuffer:
    """Per-pixel render products; the presentation heads consume this.

    The reference writes ANSI escape bytes straight from the intersection
    kernel (RayTracing.cu:231-251). Splitting "render" from "encode" is the
    TPU-native design: the framebuffer is differentiable, the heads are
    cheap post-processing.
    """

    rgb: jax.Array      # [H, W, 3] f32, 0..255, shaded (0 where no hit)
    normal: jax.Array   # [H, W, 3] f32, unit surface normal (0 where no hit)
    depth: jax.Array    # [H, W]    f32, ray parameter t (MISS_DISTANCE if miss)
    shading: jax.Array  # [H, W]    f32, dot(normal, (1,0,0)) (RayTracing.cu:133)
    hit: jax.Array      # [H, W]    bool, depth <= far (the display-hit test)
    coverage: jax.Array  # [H, W]   f32 in [0,1]: hit fraction of the cell
    #                    (== hit as float without AA; the pooled subsample
    #                    fraction under supersampling, so the heads can show
    #                    the AA blend on any partially-covered silhouette
    #                    cell while glyph fg/bg decisions keep using `hit`)
    alpha: jax.Array    # [H, W]    f32 in [0,1]: soft hit probability
    #                    (1 - softmin background weight) on the soft paths -
    #                    the differentiable silhouette channel used by
    #                    coarse-to-fine fitting (render/anneal.py); equals
    #                    `hit` as float on the hard paths


def intersect_spheres(origin: jax.Array, dirs: jax.Array, spheres: Spheres):
    """Batched analytic quadric intersection (Sphere.cu:30-68).

    origin: [3]; dirs: [..., 3] unit directions; returns (t, valid) each
    [..., N]. Uses the same quadratic form as the reference: a = d.d,
    b = 2 d.(o-c), c = |o-c|^2 - r^2; a miss if the discriminant is
    negative or either root is negative (inside / behind, Sphere.cu:55-60).
    """
    oc = origin - spheres.center                       # [N, 3]
    a = dot(dirs, dirs)[..., None]                     # [..., 1] (== 1 for unit d)
    b = 2.0 * jnp.einsum("...k,nk->...n", dirs, oc, precision=jax.lax.Precision.HIGHEST)    # [..., N]
    c = (dot(oc, oc) - spheres.radius**2)              # [N]
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / (2.0 * a)
    t1 = (-b + sq) * inv2a
    t2 = (-b - sq) * inv2a
    valid = (disc >= 0.0) & (t1 >= 0.0) & (t2 >= 0.0) & (spheres.active > 0.5)
    t = jnp.minimum(t1, t2)
    return jnp.where(valid, t, MISS_DISTANCE), valid


def sphere_normals(origin: jax.Array, dirs: jax.Array, t: jax.Array, centers: jax.Array):
    """Outward unit normal at the hit point (Sphere.cu:67)."""
    p = origin + dirs * t[..., None]
    return normalize(p - centers)


def intersect_planes(origin: jax.Array, dirs: jax.Array, planes: Planes):
    """Batched finite-rectangle intersection (Plane.cu:38-73).

    Rejects backfaces and parallel rays (denom >= -eps, Plane.cu:47), then
    t = (p - o).n / d.n with t <= 0 rejected (Plane.cu:52-57), then clamps
    the hit point to the world-axis-aligned x/z extent (Plane.cu:59-68).
    """
    denom = jnp.einsum("...k,mk->...m", dirs, planes.normal, precision=jax.lax.Precision.HIGHEST)          # [..., M]
    po = planes.center - origin                                       # [M, 3]
    num = dot(po, planes.normal)                                      # [M]
    safe_denom = jnp.where(jnp.abs(denom) < _FLT_EPSILON, -1.0, denom)
    t = num / safe_denom
    p = origin + dirs[..., None, :] * t[..., None]                    # [..., M, 3]
    half_w = planes.width * 0.5
    half_h = planes.height * 0.5
    in_rect = (
        (jnp.abs(p[..., 0] - planes.center[:, 0]) < half_w)
        & (jnp.abs(p[..., 2] - planes.center[:, 2]) < half_h)
    )
    valid = (denom < -_FLT_EPSILON) & (t > 0.0) & in_rect & (planes.active > 0.5)
    return jnp.where(valid, t, MISS_DISTANCE), valid


def trace_hard(scene: Scene, origin: jax.Array, dirs: jax.Array):
    """Closest-hit over all objects (RayTracing.cu:100-136 loop).

    Returns (t [..,], normal [..,3], color [..,3] raw 0..255, shading [..,]).
    t == MISS_DISTANCE where nothing was hit.
    """
    ts_t, _ = intersect_spheres(origin, dirs, scene.spheres)   # [..., N]
    tp_t, _ = intersect_planes(origin, dirs, scene.planes)     # [..., M]
    t_all = jnp.concatenate([ts_t, tp_t], axis=-1)             # [..., N+M]
    idx = jnp.argmin(t_all, axis=-1)                           # first-wins ties,
    t = jnp.take_along_axis(t_all, idx[..., None], axis=-1)[..., 0]

    n_sph = scene.spheres.capacity
    is_sphere = idx < n_sph
    sph_idx = jnp.where(is_sphere, idx, 0)
    pl_idx = jnp.where(is_sphere, 0, idx - n_sph)

    sph_n = sphere_normals(origin, dirs, t, scene.spheres.center[sph_idx])
    pl_n = scene.planes.normal[pl_idx]
    normal = jnp.where(is_sphere[..., None], sph_n, pl_n)
    # The reference re-normalizes the stored normal (RayTracing.cu:129).
    normal = normalize(normal)

    color = jnp.where(
        is_sphere[..., None],
        scene.spheres.color[sph_idx],
        scene.planes.color[pl_idx],
    )
    # Temporary directional shading term driving the ASCII ramp
    # (RayTracing.cu:131-133: dot(normal, (1,0,0))).
    shading = normal[..., 0]

    miss = t >= MISS_DISTANCE
    normal = jnp.where(miss[..., None], 0.0, normal)
    color = jnp.where(miss[..., None], 0.0, color)
    shading = jnp.where(miss, 0.0, shading)
    return t, normal, color, shading


def blinn_phong(
    object_diffuse: jax.Array,   # [..., 3] 0..1
    object_specular: jax.Array,  # [..., 3] 0..1
    point: jax.Array,            # [..., 3]
    view_dir: jax.Array,         # [..., 3]
    normal: jax.Array,           # [..., 3]
    config: RenderConfig,
    light_visibility: jax.Array | None = None,  # [...] in [0,1]; None = fully lit
) -> jax.Array:
    """Blinn-Phong point-light shading (RayTracing.cu:41-79), exact constant
    parity: 1/d^2 attenuation, clamped N.L and N.H, shininess 32, ambient
    0.2. `light_visibility` scales diffuse+specular for the (new) hard
    shadow capability; ambient always survives."""
    light_pos = jnp.asarray(config.light_pos, jnp.float32)
    light_dir = light_pos - point
    inv_d2 = 1.0 / dot(light_dir, light_dir)
    # safe_normalize (vs the reference's unchecked Normalize_GPU) so that the
    # soft renderer's masked-out objects (zero normals / degenerate points)
    # contribute 0 instead of NaN through their vanishing softmin weights.
    light_dir = safe_normalize(light_dir)
    n = safe_normalize(normal)
    v = safe_normalize(view_dir)

    diffuse_i = jnp.clip(dot(n, light_dir), 0.0, 1.0)
    diffuse = (
        jnp.asarray(config.light_diffuse_color, jnp.float32)
        * (diffuse_i * config.light_diffuse_power * inv_d2)[..., None]
    )
    h = safe_normalize(light_dir + v)
    spec_i = jnp.clip(dot(n, h), 0.0, 1.0) ** config.specular_hardness
    specular = (
        jnp.asarray(config.light_specular_color, jnp.float32)
        * (spec_i * config.light_specular_power * inv_d2)[..., None]
    )
    if light_visibility is not None:
        diffuse = diffuse * light_visibility[..., None]
        specular = specular * light_visibility[..., None]
    ambient = config.ambient * object_diffuse
    return ambient + diffuse * object_diffuse + specular * object_specular


def _shadow_visibility(scene: Scene, point: jax.Array, config: RenderConfig) -> jax.Array:
    """Hard shadow test (new capability, BASELINE north star): cast a ray
    from the hit point to the light; any occluder strictly between them
    kills direct light. eps offset avoids self-intersection."""
    light_pos = jnp.asarray(config.light_pos, jnp.float32)
    to_light = light_pos - point
    dist = jnp.sqrt(dot(to_light, to_light))
    d = to_light / dist[..., None]
    o = point + d * 1e-3
    # Per-pixel origins: einsum the sphere test manually (origins vary here).
    oc = o[..., None, :] - scene.spheres.center                       # [..., N, 3]
    b = 2.0 * jnp.sum(d[..., None, :] * oc, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - scene.spheres.radius**2
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b + sq) * 0.5
    t2 = (-b - sq) * 0.5
    s_valid = (disc >= 0.0) & (t1 >= 0.0) & (t2 >= 0.0) & (scene.spheres.active > 0.5)
    s_t = jnp.minimum(t1, t2)
    s_block = s_valid & (s_t < dist[..., None])

    denom = jnp.sum(d[..., None, :] * scene.planes.normal, axis=-1)
    po = scene.planes.center - o[..., None, :]
    num = jnp.sum(po * scene.planes.normal, axis=-1)
    safe_denom = jnp.where(jnp.abs(denom) < _FLT_EPSILON, -1.0, denom)
    pt = num / safe_denom
    pp = o[..., None, :] + d[..., None, :] * pt[..., None]
    in_rect = (
        (jnp.abs(pp[..., 0] - scene.planes.center[:, 0]) < scene.planes.width * 0.5)
        & (jnp.abs(pp[..., 2] - scene.planes.center[:, 2]) < scene.planes.height * 0.5)
    )
    p_block = (denom < -_FLT_EPSILON) & (pt > 0.0) & in_rect & (scene.planes.active > 0.5) & (pt < dist[..., None])

    blocked = jnp.any(s_block, axis=-1) | jnp.any(p_block, axis=-1)
    return jnp.where(blocked, 0.0, 1.0)


def shade(
    scene: Scene,
    origin: jax.Array,
    dirs: jax.Array,
    t: jax.Array,
    normal: jax.Array,
    color: jax.Array,
    config: RenderConfig,
) -> jax.Array:
    """Apply Blinn-Phong and the reference's 0..255 clamp
    (RayTracing.cu:143-157): rgb = min(255, 255 * shade(color/255))."""
    point = origin + dirs * t[..., None]
    view_dir = normalize(-dirs)
    vis = _shadow_visibility(scene, point, config) if config.shadows else None
    shaded = blinn_phong(
        color / 255.0,
        jnp.asarray(config.object_specular_color, jnp.float32),
        point,
        view_dir,
        normal,
        config,
        light_visibility=vis,
    )
    rgb = jnp.minimum(255.0, shaded * 255.0)
    miss = t >= MISS_DISTANCE
    return jnp.where(miss[..., None], 0.0, rgb)


def supersampled_config(config: RenderConfig) -> RenderConfig:
    """The render-resolution config for config.supersample: ss x the cell
    grid with an identical frustum (aspect = 1/(aspect_coeff*height) must
    not change, so aspect_coeff scales down by ss)."""
    ss = config.supersample
    if ss <= 1:
        return config
    return config.replace(
        width=config.width * ss,
        height=config.height * ss,
        aspect_coeff=config.aspect_coeff / ss,
        supersample=1,
    )


def downsample_framebuffer(fb: Framebuffer, ss: int) -> Framebuffer:
    """Box-filter an ss-supersampled framebuffer to the cell grid (AA head).

    rgb/shading average over display-hit subsamples with misses contributing
    black (the silhouette blend that IS the anti-aliasing; masking by hit
    keeps beyond-far-plane subsample color out, matching the heads' hit
    masking on the ss=1 path); normals average over hit subsamples and
    renormalize; depth averages over hit subsamples only (the MISS_DISTANCE
    sentinel would poison a plain mean); a cell is a hit when at least half
    its subsamples hit, but `coverage` carries the exact pooled fraction so
    the display heads can show the AA blend on any touched cell.
    """
    if ss <= 1:
        return fb
    H, W = fb.depth.shape
    h, w = H // ss, W // ss

    def pool(x):
        return x.reshape(h, ss, w, ss, *x.shape[2:]).mean(axis=(1, 3))

    hitf = pool(fb.hit.astype(jnp.float32))
    denom = jnp.maximum(hitf, 1.0 / (ss * ss))
    hit_mask = fb.hit.astype(jnp.float32)
    depth = jnp.where(
        hitf > 0.0,
        pool(fb.depth * hit_mask) / denom,
        MISS_DISTANCE,
    )
    return Framebuffer(
        rgb=pool(fb.rgb * hit_mask[..., None]),
        normal=safe_normalize(pool(fb.normal * hit_mask[..., None])),
        depth=depth,
        shading=pool(fb.shading * hit_mask),
        hit=hitf >= 0.5,
        coverage=hitf,
        alpha=pool(fb.alpha),
    )


def render_frame(scene: Scene, camera: Camera, config: RenderConfig) -> Framebuffer:
    """Full forward render: ray-gen -> closest-hit -> shade -> framebuffer.

    The analogue of one RayTracingManager::Update GPU pass
    (RayTracingManager.cu:76-154) minus the host roundtrip: output stays on
    device as a differentiable Framebuffer pytree.
    """
    e1, e2 = projection_elements(config)
    origin, dirs = camera_rays(camera, config.width, config.height, e1, e2)
    t, normal, color, shading = trace_hard(scene, origin, dirs)
    rgb = shade(scene, origin, dirs, t, normal, color, config)
    hit = t <= config.far
    return Framebuffer(rgb=rgb, normal=normal, depth=t, shading=shading, hit=hit,
                       coverage=hit.astype(jnp.float32),
                       alpha=hit.astype(jnp.float32))
