"""Fused Pallas soft renderer: forward + custom-VJP backward kernels.

This is the speed-of-light fwd+bwd path for the BASELINE headline metric
(rays/sec/chip fwd+bwd). The jnp soft renderer (render/softmin.py) is the
semantic source of truth but materializes [H, W, n_objects, 3] shading
intermediates in HBM, making 1080p training HBM-bound (~90 ms/frame
measured). Here the soft-min over objects is computed *online* inside the
kernel (flash-attention-style running (max, sum, weighted accumulators)),
so per-object quantities live only in VPU registers / VMEM and the HBM
traffic is exactly the framebuffer planes.

Two train paths share the machinery:
  - the GENERIC custom_vjp (any loss): forward kernel writes the plane
    stack + softmax statistics, a separate backward kernel consumes the
    saved planes and the caller's cotangents (design below);
  - the ONE-PASS fused MSE path (_soft_mse_fused_body, the bench
    headline): for loss = mean(((rgb-target)/255)^2) the cotangents are
    derivable the moment a tile's forward finishes, so forward render,
    loss, and the full backward run per tile in a SINGLE kernel with
    everything register/VMEM-resident - only the loss scalar and the
    ~10 KB gradient tables touch HBM. Gradients are computed at
    loss-cotangent 1 and scaled in the vjp rule (exactly linear).

Backward design (custom_vjp):
  - the forward kernel additionally writes its softmax statistics
    (running max m, normalizer s) per ray: 10 output planes total;
  - the backward kernel recomputes each object's soft intersection +
    shading (cheap, register-resident) and applies the closed-form softmax
    VJP:   dL/dlogit_k = w_k (g.v_k - sum_j w_j g.v_j),
    chaining into per-object parameter gradients with jax.vjp *inside the
    kernel body* (the per-object function is a few dozen traced jnp ops;
    scalar-input cotangents come back pre-reduced over the ray tile by the
    transpose rules);
  - per-object gradients accumulate across grid tiles into small SMEM
    tables (same [8, NS]/[12, NP] layout as render/pack.py), camera
    gradients into a [1,16] vector through the in-kernel ray-generation
    VJP; the TPU grid is sequential so read-modify-write accumulation
    across tiles is race-free;
  - object counts ride in spare slots of the camera vector as f32 so every
    differentiable input of the custom_vjp is float (no int cotangents).

Semantics match render/softmin.py::trace_soft (same penalty formulation,
same Blinn-Phong constants, RayTracing.cu:41-79 parity) and are validated
against it by tests/test_pallas_soft.py: forward allclose + gradients
allclose vs jax.grad of the jnp path.
"""
from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtwc_tpu.camera import Camera
from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render.reference import Framebuffer, _FLT_EPSILON
from rtwc_tpu.render import pack as P
from rtwc_tpu.render.pallas_kernel import _pow_int, _round_up

# Output plane indices. Planes 10-13 exist only when config.shadows is on:
# the soft light visibility at the blended hit point and its saved value-path
# jacobian d(rgb)/d(vis) (the clamp-gated direct-light blend), which lets the
# backward kernel form dL/dvis from the output cotangents without replaying
# the object sweep twice.
(SO_R, SO_G, SO_B, SO_DEPTH, SO_NX, SO_NY, SO_NZ, SO_ALPHA, SO_M, SO_S,
 SO_VIS, SO_DVR, SO_DVG, SO_DVB) = range(14)
N_PLANES, N_PLANES_SH = 10, 14
# Per-occluder shadow transmittance floor (softmin.py parity; see its note).
_TRANS_FLOOR = 1e-7
# Camera-vector spare slots: live-object counts as f32, and the band's
# first image row (tile-sharding: each device renders rows
# [row0, row0 + band_height) of the full image, dist/mesh.py).
C_NSPH, C_NPL, C_ROW0 = 12, 13, 14


def _softplus(x):
    # jax.nn.softplus = logaddexp(x, 0); spelled out for clean in-kernel vjp.
    return jnp.logaddexp(x, 0.0)


def _kahan_add(ref, idx, val):
    """Compensated (Kahan) add of scalar `val` into ref[0, idx], carrying
    the running f32 rounding error in ref[1, idx]. The camera-rotation
    cotangents accumulate one scalar per grid tile in SMEM; plain += over
    hundreds of tiles leaves ~1e-2 relative scatter vs the jnp renderer's
    tree reduction (VERDICT r3 weak #7) - compensation recovers it."""
    c = ref[1, idx]
    y = val - c
    s = ref[0, idx]
    t = s + y
    ref[1, idx] = (t - s) - y
    ref[0, idx] = t



def _make_object_fns(config: RenderConfig, tau: float):
    """Per-object soft intersection + shading closures, exact
    render/softmin.py semantics. All inputs scalars except the ray
    direction planes (dx, dy, dz); outputs are ray-tile planes
    (t_eff, r, g, b, t_clip, nx, ny, nz)."""
    far = config.far
    k = config.soft_mask_k
    mp = config.soft_miss_penalty
    lx, ly, lz = config.light_pos
    ldc = config.light_diffuse_color
    lsc = config.light_specular_color
    osc = config.object_specular_color
    dpow = config.light_diffuse_power
    spow = config.light_specular_power
    hard = int(config.specular_hardness)
    amb = config.ambient

    def pen(x):
        return _softplus(-k * x) / k

    def shade_terms(px, py, pz, nx, ny, nz, dx, dy, dz):
        """Color-independent Blinn-Phong terms (dterm, sterm): the ONLY
        ray-plane-valued state shading needs. Everything per-channel is a
        scalar combination of these two planes and the object's color
        scalars (parts_from_terms) - which is what lets the shadowed
        forward's clamp-correction cache store 3 planes per object
        (t_eff, dterm, sterm) instead of 7 (t_eff, A_rgb, B_rgb)."""
        ldx, ldy, ldz = lx - px, ly - py, lz - pz
        d2 = ldx * ldx + ldy * ldy + ldz * ldz
        il = jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
        inv_d2 = il * il  # 1/d^2 without the divide
        ldx, ldy, ldz = ldx * il, ldy * il, ldz * il
        # Normals arrive UNIT (sphere_geo normalizes per ray; plane_geo
        # normalizes its per-object scalars): softmin.py's in-shade
        # normalize is idempotent here, in value AND gradient (the unit-
        # sphere projection is idempotent), so the per-ray vector rsqrt
        # it would cost is dropped - the transcendental pipe is the
        # forward sweep's bottleneck (see utils/roofline.py on density).
        diffuse_i = jnp.clip(nx * ldx + ny * ldy + nz * ldz, 0.0, 1.0)
        dterm = diffuse_i * dpow * inv_d2
        hx, hy, hz = ldx - dx, ldy - dy, ldz - dz
        ih = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-20))
        spec_i = jnp.clip((nx * hx + ny * hy + nz * hz) * ih, 0.0, 1.0)
        sterm = _pow_int(spec_i, hard) * spow * inv_d2
        return dterm, sterm

    def parts_from_terms(dterm, sterm, cr, cg, cb):
        def parts(col, ld_c, ls_c, os_c):
            cd = col * (1.0 / 255.0)
            return amb * cd * 255.0, (dterm * ld_c * cd + sterm * ls_c * os_c) * 255.0

        return (parts(cr, ldc[0], lsc[0], osc[0]),
                parts(cg, ldc[1], lsc[1], osc[1]),
                parts(cb, ldc[2], lsc[2], osc[2]))

    def shade_parts(cr, cg, cb, px, py, pz, nx, ny, nz, dx, dy, dz):
        # Blinn-Phong (RayTracing.cu:41-79 constants), softmin.py path:
        # view = -d (unit), light attenuates 1/d^2, ambient always on.
        # Returns the ambient and direct parts per channel in the 0..255
        # domain, so rgb_c = min(255, A_c + vis * B_c): the clamp is the
        # only nonlinearity between the parts and the output, which is what
        # lets the shadow path save d(rgb)/d(vis) as a plane.
        dterm, sterm = shade_terms(px, py, pz, nx, ny, nz, dx, dy, dz)
        return parts_from_terms(dterm, sterm, cr, cg, cb)

    def shade(cr, cg, cb, px, py, pz, nx, ny, nz, dx, dy, dz, vis=None):
        out = []
        for a_c, b_c in shade_parts(cr, cg, cb, px, py, pz, nx, ny, nz,
                                    dx, dy, dz):
            direct = b_c if vis is None else vis * b_c
            out.append(jnp.minimum(255.0, a_c + direct))
        return tuple(out)

    def sphere_lb_ex(scx, scy, scz, r, dx, dy, dz, ox, oy, oz):
        """Transcendental-free-penalty LOWER bound on the sphere's t_eff
        (pen(x) = softplus(-k x)/k >= relu(-x)): the per-tile culling
        predicate. Returns (lb, t2, dss) - the bound PLUS the quadratic
        solve's products (root t2 and the scaled discriminant
        disc/r_clamped^2), so the heavy branch behind the culling cond
        reuses them (sphere_geo_post) instead of re-solving: the sqrt
        here is the costliest VPU op on this chip (~3.8 measured
        FMA-slots, utils/roofline.py) and the forward sweep is
        transcendental-pipe-bound, so solving ONCE per relevant object
        is the single biggest lever on the headline path (VERDICT r4
        weak #1; the per-thread single-solve structure of the
        reference's Sphere.cu:30-68)."""
        ocx, ocy, ocz = ox - scx, oy - scy, oz - scz
        b = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * c
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t2 = 0.5 * (-b - sq)
        scale = 1.0 / jnp.maximum(r, 1e-3)
        dss = disc * scale * scale
        lb = jnp.clip(t2, 0.0, far) + mp * (
            jnp.maximum(-dss, 0.0) + jnp.maximum(-t2, 0.0))
        return lb, t2, dss

    def sphere_lb(scx, scy, scz, r, dx, dy, dz, ox, oy, oz):
        """Bound only - the backward kernels' relevance gate (their heavy
        branch replays the full solve under jax.vjp anyway)."""
        return sphere_lb_ex(scx, scy, scz, r, dx, dy, dz, ox, oy, oz)[0]

    def plane_lb_ex(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, dx, dy, dz, ox, oy, oz):
        """Plane t_eff lower bound + solve products (t, denom, and the
        hit-point coordinates the bound already formed) for reuse by
        plane_geo_post behind the culling cond - deletes the divide and
        the hit-point FMAs from the heavy branch."""
        denom = dx * pnx + dy * pny + dz * pnz
        num = (pcx - ox) * pnx + (pcy - oy) * pny + (pcz - oz) * pnz
        eps = jnp.float32(_FLT_EPSILON)
        safe = jnp.where(jnp.abs(denom) < eps, -eps, denom)
        t = num / safe
        t_clip = jnp.clip(t, 0.0, far)
        px = ox + dx * t_clip
        pz = oz + dz * t_clip
        lb = t_clip + mp * (
            jnp.maximum(denom + eps, 0.0)
            + jnp.maximum(-t, 0.0)
            + jnp.maximum(jnp.abs(px - pcx) - hw, 0.0)
            + jnp.maximum(jnp.abs(pz - pcz) - hh, 0.0))
        return lb, t, denom, px, pz

    def plane_lb(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, dx, dy, dz, ox, oy, oz):
        return plane_lb_ex(pcx, pcy, pcz, pnx, pny, pnz, hw, hh,
                           dx, dy, dz, ox, oy, oz)[0]

    def sphere_geo(scx, scy, scz, r, dx, dy, dz, ox, oy, oz):
        """(t_eff, t_clip, normal, hit point) - shading-free intersection."""
        ocx, ocy, ocz = ox - scx, oy - scy, oz - scz
        b = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * c
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t2 = 0.5 * (-b - sq)
        scale = 1.0 / jnp.maximum(r, 1e-3)
        # t1 = t2 + sq >= t2, so pen(t2) covers the reference's t1/t2 >= 0
        # pair (Sphere.cu:55-60) exactly; one softplus saved per object.
        p_ = mp * (pen(disc * scale * scale) + pen(t2))
        t_clip = jnp.clip(t2, 0.0, far)
        px = ox + dx * t_clip
        py = oy + dy * t_clip
        pz = oz + dz * t_clip
        nxr, nyr, nzr = px - scx, py - scy, pz - scz
        inn = jax.lax.rsqrt(jnp.maximum(nxr * nxr + nyr * nyr + nzr * nzr, 1e-20))
        return (t_clip + p_, t_clip,
                nxr * inn, nyr * inn, nzr * inn, px, py, pz)

    def plane_geo(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, dx, dy, dz, ox, oy, oz):
        denom = dx * pnx + dy * pny + dz * pnz
        num = (pcx - ox) * pnx + (pcy - oy) * pny + (pcz - oz) * pnz
        eps = jnp.float32(_FLT_EPSILON)
        safe = jnp.where(jnp.abs(denom) < eps, -eps, denom)
        t = num / safe
        t_clip = jnp.clip(t, 0.0, far)
        px = ox + dx * t_clip
        py = oy + dy * t_clip
        pz = oz + dz * t_clip
        p_ = mp * (pen(-denom - eps) + pen(t)
                   + pen(hw - jnp.abs(px - pcx))
                   + pen(hh - jnp.abs(pz - pcz)))
        nx = pnx + 0.0 * dx   # RAW normal broadcast: softmin.py blends the
        ny = pny + 0.0 * dx   # raw plane normal into the framebuffer
        nz = pnz + 0.0 * dx   # (shading separately uses plane_unit_n)
        return t_clip + p_, t_clip, nx, ny, nz, px, py, pz

    def sphere_geo_post(scx, scy, scz, t2, dss, dx, dy, dz, ox, oy, oz):
        """sphere_geo continued from sphere_lb_ex's solve products:
        penalties, hit point and normal WITHOUT re-running the quadratic
        (same expressions as sphere_geo from t2/dss on - bit-identical).
        Forward sweeps only; the backward replays sphere_f under jax.vjp
        because the solve must be on the autodiff tape there."""
        p_ = mp * (pen(dss) + pen(t2))
        t_clip = jnp.clip(t2, 0.0, far)
        px = ox + dx * t_clip
        py = oy + dy * t_clip
        pz = oz + dz * t_clip
        nxr, nyr, nzr = px - scx, py - scy, pz - scz
        inn = jax.lax.rsqrt(jnp.maximum(nxr * nxr + nyr * nyr + nzr * nzr, 1e-20))
        return (t_clip + p_, t_clip,
                nxr * inn, nyr * inn, nzr * inn, px, py, pz)

    def plane_geo_post(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, t, denom,
                       px, pz, dx, dy, dz, ox, oy, oz):
        """plane_geo continued from plane_lb_ex's solve products
        (bit-identical expressions from t/denom/px/pz on)."""
        eps = jnp.float32(_FLT_EPSILON)
        t_clip = jnp.clip(t, 0.0, far)
        py = oy + dy * t_clip
        p_ = mp * (pen(-denom - eps) + pen(t)
                   + pen(hw - jnp.abs(px - pcx))
                   + pen(hh - jnp.abs(pz - pcz)))
        nx = pnx + 0.0 * dx   # RAW normal broadcast (see plane_geo)
        ny = pny + 0.0 * dx
        nz = pnz + 0.0 * dx
        return t_clip + p_, t_clip, nx, ny, nz, px, py, pz

    def plane_unit_n(pnx, pny, pnz):
        """Unit shading normal from the per-object scalars: ONE scalar
        rsqrt per object instead of softmin.py's per-ray vector
        normalize (value- and gradient-identical: the normalize is
        idempotent and its projection jacobian is idempotent too)."""
        pn_inv = jax.lax.rsqrt(
            jnp.maximum(pnx * pnx + pny * pny + pnz * pnz, 1e-20))
        return pnx * pn_inv, pny * pn_inv, pnz * pn_inv

    def sphere_f(scx, scy, scz, r, cr, cg, cb, dx, dy, dz, ox, oy, oz,
                 vis=None):
        t_eff, t_clip, nx, ny, nz, px, py, pz = sphere_geo(
            scx, scy, scz, r, dx, dy, dz, ox, oy, oz)
        r_, g_, b_ = shade(cr, cg, cb, px, py, pz, nx, ny, nz, dx, dy, dz, vis)
        return t_eff, r_, g_, b_, t_clip, nx, ny, nz

    def plane_f(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, cr, cg, cb,
                dx, dy, dz, ox, oy, oz, vis=None):
        t_eff, t_clip, nx, ny, nz, px, py, pz = plane_geo(
            pcx, pcy, pcz, pnx, pny, pnz, hw, hh, dx, dy, dz, ox, oy, oz)
        ux, uy, uz = plane_unit_n(pnx, pny, pnz)
        r_, g_, b_ = shade(cr, cg, cb, px, py, pz, ux, uy, uz, dx, dy, dz, vis)
        return t_eff, r_, g_, b_, t_clip, nx, ny, nz

    def sphere_f_post(scx, scy, scz, t2, dss, cr, cg, cb,
                      dx, dy, dz, ox, oy, oz, vis=None):
        """sphere_f continued from sphere_lb_ex's solve (culled forward
        sweeps; value-identical to sphere_f on the shared inputs)."""
        t_eff, t_clip, nx, ny, nz, px, py, pz = sphere_geo_post(
            scx, scy, scz, t2, dss, dx, dy, dz, ox, oy, oz)
        r_, g_, b_ = shade(cr, cg, cb, px, py, pz, nx, ny, nz, dx, dy, dz, vis)
        return t_eff, r_, g_, b_, t_clip, nx, ny, nz

    def plane_f_post(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, t, denom, px, pz,
                     cr, cg, cb, dx, dy, dz, ox, oy, oz, vis=None):
        t_eff, t_clip, nx, ny, nz, hx, hy, hz = plane_geo_post(
            pcx, pcy, pcz, pnx, pny, pnz, hw, hh, t, denom, px, pz,
            dx, dy, dz, ox, oy, oz)
        ux, uy, uz = plane_unit_n(pnx, pny, pnz)
        r_, g_, b_ = shade(cr, cg, cb, hx, hy, hz, ux, uy, uz, dx, dy, dz, vis)
        return t_eff, r_, g_, b_, t_clip, nx, ny, nz

    # Shadow occluder transmittances (softmin.py _soft_shadow_visibility
    # parity): each hard shadow-ray reject branch is a sigmoid step, the
    # any-occluder OR a product of per-occluder transmittances, evaluated at
    # the softmin-blended hit point P. The light direction is recomputed
    # from P *inside* each closure so jax.vjp reaches every P dependency.
    ks = config.soft_shadow_k

    def _light_ray(px, py, pz):
        tlx, tly, tlz = lx - px, ly - py, lz - pz
        d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-12)
        inv = jax.lax.rsqrt(d2)   # one rsqrt replaces sqrt + div
        dist = d2 * inv
        sdx, sdy, sdz = tlx * inv, tly * inv, tlz * inv
        # self-intersection offset (softmin.py uses 1e-2)
        return (sdx, sdy, sdz, dist,
                px + sdx * 1e-2, py + sdy * 1e-2, pz + sdz * 1e-2)

    def _blocked(args):
        """prod_i sigmoid(ks * a_i) via ONE division: sigmoid costs ~5
        measured FMA-slots on this chip (the divide inside it dominates)
        while exp costs 0.23, so prod sig(x_i) = 1 / prod(1 + exp(-x_i))
        replaces n divides with one. Exponents clamp at 20: e^20 ~ 5e8
        already makes the factor's sigmoid saturate to ~2e-9 (below f32
        noise, like the saturated sigmoid it replaces). The worst caller
        passes 5 factors (shadow_plane_f), so P can reach e^100 and
        OVERFLOW f32 (ln(f32 max) ~ 88.7) - that is safe BY CONSTRUCTION
        here, not accidental: P only overflows when >= 2 factors clamp,
        every finite prefix of the product is >= 1 (each factor >= 1),
        and 1/inf == 0 is exactly the saturated block value; in the vjp,
        d(block)/d(factor) = -block/factor has block == 0 against finite
        factors, so no inf * 0. Adding a 6th factor or raising the clamp
        keeps these invariants - what must NOT change is factors >= 1."""
        P = jnp.float32(1.0)
        for a in args:
            P = P * (1.0 + jnp.exp(jnp.minimum(-ks * a, 20.0)))
        return 1.0 / P

    def shadow_sphere_f(scx, scy, scz, r, px, py, pz):
        """Per-occluder transmittance 1 - block in [_TRANS_FLOOR, 1]."""
        sdx, sdy, sdz, dist, sox, soy, soz = _light_ray(px, py, pz)
        ocx, ocy, ocz = sox - scx, soy - scy, soz - scz
        b = 2.0 * (sdx * ocx + sdy * ocy + sdz * ocz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * c
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t1 = 0.5 * (-b + sq)
        t2 = 0.5 * (-b - sq)
        scale = 1.0 / jnp.maximum(r, 1e-3)
        block = _blocked((disc * scale * scale, t1, t2, dist - t2))
        return jnp.maximum(1.0 - block, _TRANS_FLOOR)

    def shadow_plane_f(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, px, py, pz):
        sdx, sdy, sdz, dist, sox, soy, soz = _light_ray(px, py, pz)
        denom = sdx * pnx + sdy * pny + sdz * pnz
        num = (pcx - sox) * pnx + (pcy - soy) * pny + (pcz - soz) * pnz
        eps = jnp.float32(_FLT_EPSILON)
        safe = jnp.where(jnp.abs(denom) < eps, -eps, denom)
        t = num / safe
        ppx = sox + sdx * t
        ppz = soz + sdz * t
        block = _blocked((-denom - eps, t, hw - jnp.abs(ppx - pcx),
                          hh - jnp.abs(ppz - pcz), dist - t))
        return jnp.maximum(1.0 - block, _TRANS_FLOOR)

    # Sigmoid-free occlusion bounds for backward-pass culling:
    # block <= sigmoid(ks * min_c(arg_c)), so an occluder whose min
    # constraint arg stays below -16/ks everywhere in the tile has
    # block < ~1e-7 -> transmittance ~1 and sub-ULP parameter cotangents;
    # its (expensive) vjp replay is skipped.
    def shadow_sphere_args(scx, scy, scz, r, px, py, pz):
        sdx, sdy, sdz, dist, sox, soy, soz = _light_ray(px, py, pz)
        ocx, ocy, ocz = sox - scx, soy - scy, soz - scz
        b = 2.0 * (sdx * ocx + sdy * ocy + sdz * ocz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * c
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t1 = 0.5 * (-b + sq)
        t2 = 0.5 * (-b - sq)
        scale = 1.0 / jnp.maximum(r, 1e-3)
        return jnp.minimum(
            jnp.minimum(disc * scale * scale, dist - t2),
            jnp.minimum(t1, t2))

    def shadow_plane_args(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, px, py, pz):
        sdx, sdy, sdz, dist, sox, soy, soz = _light_ray(px, py, pz)
        denom = sdx * pnx + sdy * pny + sdz * pnz
        num = (pcx - sox) * pnx + (pcy - soy) * pny + (pcz - soz) * pnz
        eps = jnp.float32(_FLT_EPSILON)
        safe = jnp.where(jnp.abs(denom) < eps, -eps, denom)
        t = num / safe
        ppx = sox + sdx * t
        ppz = soz + sdz * t
        return jnp.minimum(
            jnp.minimum(-denom - eps, t),
            jnp.minimum(jnp.minimum(hw - jnp.abs(ppx - pcx),
                                    hh - jnp.abs(ppz - pcz)),
                        dist - t))

    # Split shadow evaluation for the forward sweep: the light ray depends
    # only on the (blended) hit point, so it hoists out of the object loop
    # entirely, and the per-occluder quadratic/plane solve produces BOTH
    # the culling bound (min of the constraint args) and the sigmoid
    # arguments - one solve instead of the bound+transmittance pair, with
    # only the 4 sigmoids left under the per-object cond. Exact same math
    # as shadow_*_f / shadow_*_args (which the backward keeps using for
    # its per-object vjp replay).
    def shadow_sphere_pre(scx, scy, scz, r, lr):
        sdx, sdy, sdz, dist, sox, soy, soz = lr
        ocx, ocy, ocz = sox - scx, soy - scy, soz - scz
        b = 2.0 * (sdx * ocx + sdy * ocy + sdz * ocz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * c
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t1 = 0.5 * (-b + sq)
        t2 = 0.5 * (-b - sq)
        scale = 1.0 / jnp.maximum(r, 1e-3)
        args = (disc * scale * scale, t1, t2, dist - t2)
        min_arg = jnp.minimum(jnp.minimum(args[0], args[3]),
                              jnp.minimum(t1, t2))
        return min_arg, args

    def shadow_sphere_preA(scx, scy, scz, r, lr):
        """Stage A of the split occluder gate: the quadratic WITHOUT the
        sqrt. The disc constraint (scaled discriminant dss) alone kills
        most listed-but-irrelevant occluders (the shadow ray passes wide
        of the sphere), and it needs no root - the sqrt (the costliest
        VPU op) only runs for occluders that survive stage A
        (shadow_sphere_preB). Bit-identical composition with
        shadow_sphere_pre."""
        sdx, sdy, sdz, dist, sox, soy, soz = lr
        ocx, ocy, ocz = sox - scx, soy - scy, soz - scz
        b = 2.0 * (sdx * ocx + sdy * ocy + sdz * ocz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * c
        scale = 1.0 / jnp.maximum(r, 1e-3)
        dss = disc * scale * scale
        return disc, dss, b, dist

    def shadow_sphere_preB(disc, dss, b, dist):
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t1 = 0.5 * (-b + sq)
        t2 = 0.5 * (-b - sq)
        args = (dss, t1, t2, dist - t2)
        min_arg = jnp.minimum(jnp.minimum(args[0], args[3]),
                              jnp.minimum(t1, t2))
        return min_arg, args

    def shadow_plane_pre(pcx, pcy, pcz, pnx, pny, pnz, hw, hh, lr):
        sdx, sdy, sdz, dist, sox, soy, soz = lr
        denom = sdx * pnx + sdy * pny + sdz * pnz
        num = (pcx - sox) * pnx + (pcy - soy) * pny + (pcz - soz) * pnz
        eps = jnp.float32(_FLT_EPSILON)
        safe = jnp.where(jnp.abs(denom) < eps, -eps, denom)
        t = num / safe
        ppx = sox + sdx * t
        ppz = soz + sdz * t
        args = (-denom - eps, t, hw - jnp.abs(ppx - pcx),
                hh - jnp.abs(ppz - pcz), dist - t)
        min_arg = jnp.minimum(jnp.minimum(args[0], args[1]),
                              jnp.minimum(jnp.minimum(args[2], args[3]),
                                          args[4]))
        return min_arg, args

    def shadow_transmittance(args):
        return jnp.maximum(1.0 - _blocked(args), _TRANS_FLOOR)

    return types.SimpleNamespace(
        sphere_f=sphere_f, plane_f=plane_f,
        sphere_f_post=sphere_f_post, plane_f_post=plane_f_post,
        sphere_lb=sphere_lb, plane_lb=plane_lb,
        sphere_lb_ex=sphere_lb_ex, plane_lb_ex=plane_lb_ex,
        sphere_geo=sphere_geo, plane_geo=plane_geo,
        sphere_geo_post=sphere_geo_post, plane_geo_post=plane_geo_post,
        plane_unit_n=plane_unit_n,
        shade_parts=shade_parts,
        shade_terms=shade_terms, parts_from_terms=parts_from_terms,
        shadow_sphere_f=shadow_sphere_f, shadow_plane_f=shadow_plane_f,
        shadow_sphere_args=shadow_sphere_args,
        shadow_plane_args=shadow_plane_args,
        light_ray=_light_ray,
        shadow_sphere_pre=shadow_sphere_pre,
        shadow_sphere_preA=shadow_sphere_preA,
        shadow_sphere_preB=shadow_sphere_preB,
        shadow_plane_pre=shadow_plane_pre,
        shadow_transmittance=shadow_transmittance,
        shadow_ks=ks,
    )


def _make_raygen(config: RenderConfig, bh: int, bw: int):
    """In-kernel ray generation as a function of the 12 camera scalars,
    exact camera/camera.py::camera_rays semantics (RayTracing.cu:9-24)."""
    from rtwc_tpu.camera import projection_elements

    W, H = config.width, config.height
    e1, e2 = projection_elements(config)

    def raygen_full(i, j, row0, rx, ry, rz, ux, uy, uz, fx, fy, fz):
        """(dx, dy, dz, vx, vy, inv): the rays plus the residuals the
        backward kernels need for the hand-written raygen VJP."""
        rowf = row0 + (i * bh).astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (bh, bw), 0).astype(jnp.float32)
        colf = (j * bw).astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (bh, bw), 1).astype(jnp.float32)
        vx = (2.0 * colf - W) / W * e1
        vy = (H - 2.0 * rowf) / H * e2
        dx = rx * vx + ry * vy + rz
        dy = ux * vx + uy * vy + uz
        dz = fx * vx + fy * vy + fz
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        return dx * inv, dy * inv, dz * inv, vx, vy, inv

    def raygen(i, j, row0, *cam9):
        return raygen_full(i, j, row0, *cam9)[:3]

    raygen.full = raygen_full
    return raygen


def _two_sum(a, b):
    """Knuth error-free transformation: a + b = s + err exactly."""
    s = a + b
    bv = s - a
    av = s - bv
    return s, (a - av) + (b - bv)


def _tf_combine(s1, e1, s2, e2):
    s, err = _two_sum(s1, s2)
    return s, e1 + e2 + err


def _twofloat_plane_sum(x):
    """Compensated (two-float) sum of a (bh, bw) f32 plane -> (hi, lo).

    The camera-basis cotangent sums are catastrophically cancellative:
    the vx ramp is antisymmetric across the image, so per-ray
    contributions of magnitude ~1e5x the total cancel, and ANY plain-f32
    reduction (including jnp's tree reduce - measured 19-40% error vs
    f64 on the 640x360 check scene) destroys the result. Every combine
    here is an error-free TwoSum with the rounding error carried in a
    second float, giving ~2^-48 effective precision: (bh, bw) folds to
    one (8, 128) vreg by chunk combines, then a butterfly of cyclic
    pltpu.roll shifts reduces within the vreg (every lane ends up with
    the total; [0, 0] is read out). ~10 VPU ops per element vs 1 for a
    plain sum - only the 9 camera-basis reductions per tile pay it.

    Requires a vreg-aligned plane: the chunk fold truncates remainder
    rows/cols, and a butterfly roll by a full axis length is the identity
    (the plane would combine with itself). _pick_tiles rounds every
    user-supplied tile shape to these multiples before it reaches here."""
    assert x.shape[0] % 8 == 0 and x.shape[1] % 128 == 0, (
        f"_twofloat_plane_sum needs (8k, 128k) tiles, got {x.shape}")
    def fold(chunks):
        # pairwise tree of two-float combines over a static chunk list
        while len(chunks) > 1:
            nxt = [_tf_combine(*a, *b) for a, b in zip(chunks[::2], chunks[1::2])]
            if len(chunks) % 2:
                nxt.append(chunks[-1])
            chunks = nxt
        return chunks[0]

    s, e = x, jnp.zeros_like(x)
    if s.shape[0] > 8:
        s, e = fold([(s[k * 8:(k + 1) * 8], e[k * 8:(k + 1) * 8])
                     for k in range(s.shape[0] // 8)])
    if s.shape[1] > 128:
        s, e = fold([(s[:, k * 128:(k + 1) * 128], e[:, k * 128:(k + 1) * 128])
                     for k in range(s.shape[1] // 128)])
    # butterfly within the (8, 128) vreg: cyclic rolls, exact combines
    for axis, shifts in ((0, (4, 2, 1)), (1, (64, 32, 16, 8, 4, 2, 1))):
        for sh in shifts:
            s2 = pltpu.roll(s, sh, axis)
            e2 = pltpu.roll(e, sh, axis)
            s, e = _tf_combine(s, e, s2, e2)
    return s[0, 0], e[0, 0]


_CULL_LOG_EPS = -16.0  # max relative softmin weight exp(-16) ~ 1e-7: sub-ULP in f32


def _tile_cones(cam, config: RenderConfig, bh: int, bw: int, grid):
    """Per-grid-tile bounding ray cones: unit axis [Ti,Tj,3] and cos of
    the half-angle [Ti,Tj], from the tile's 4 corner rays (padded tile
    extent - conservative for edge tiles). Shared by the view-frustum
    (_sphere_tile_lists) and shadow (_shadow_tile_lists) broad phases."""
    from rtwc_tpu.camera import projection_elements

    W, H = config.width, config.height
    e1, e2 = projection_elements(config)
    Ti, Tj = grid
    row0 = cam[0, C_ROW0]
    r_lo = row0 + jnp.arange(Ti, dtype=jnp.float32) * bh          # [Ti]
    c_lo = jnp.arange(Tj, dtype=jnp.float32) * bw                 # [Tj]
    rr = jnp.stack([r_lo, r_lo + bh - 1.0], -1)                   # [Ti, 2]
    cc = jnp.stack([c_lo, c_lo + bw - 1.0], -1)                   # [Tj, 2]
    vy = (H - 2.0 * rr) / H * e2                                  # [Ti, 2]
    vx = (2.0 * cc - W) / W * e1                                  # [Tj, 2]
    right = cam[0, 3:6]
    up = cam[0, 6:9]
    fwd = cam[0, 9:12]
    # d = vx * right + vy * up + fwd for the 4 corner combinations
    d_raw = (vx[None, :, None, :, None] * right
             + vy[:, None, :, None, None] * up
             + fwd)                                               # [Ti,Tj,2,2,3]
    d_raw = d_raw.reshape(Ti, Tj, 4, 3)
    d = d_raw / jnp.linalg.norm(d_raw, axis=-1, keepdims=True)
    axis = jnp.sum(d, axis=2)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)   # [Ti,Tj,3]
    cos_cone = jnp.min(jnp.einsum("tjk,tjck->tjc", axis, d), axis=-1)
    # d_raw: the UNNORMALIZED corner dirs (linear in the NDC coords, so
    # plane denominators d_raw.n are corner-extremal - the depth-bounded
    # shadow broad phase's plane certificates build on that).
    return axis, jnp.clip(cos_cone, -1.0, 1.0), d_raw


def _compact_lists(incl, sort_key=None):
    """[T, NS] inclusion mask -> int32 [T, 1, NS+1] work-list table:
    slot 0 = list length, then the included indices compacted to the
    front (never overflows: the row holds all NS), ordered by sort_key
    ascending (index order when None). The [T, 1, NS+1] shape: Mosaic
    requires the last two dims of an SMEM block to equal the array's, so
    the per-tile selection rides the leading dim."""
    if sort_key is None:
        key = jnp.where(incl, 0.0, jnp.inf)
    else:
        key = jnp.where(incl, sort_key, jnp.inf)
    order = jnp.argsort(key, axis=1, stable=True)
    count = jnp.sum(incl, axis=1).astype(jnp.int32)
    table = jnp.concatenate([count[:, None], order.astype(jnp.int32)], axis=1)
    return table[:, None, :]


def _sphere_tile_lists(sph, cam, config: RenderConfig, tau: float,
                       bh: int, bw: int, grid, hard: bool = False,
                       disable: bool = False, cones=None):
    """Per-tile sphere work lists: the O(N) -> O(relevant) loop upgrade.

    A cheap cone-vs-sphere test OUTSIDE the kernel decides, per grid tile,
    which spheres could carry softmin weight > exp(-16) relative to the
    ALWAYS-present background competitor for ANY ray of the tile; the
    kernels then loop only over each tile's list (indices via SMEM, one
    scalar read per object) instead of all N, and the per-ray in-kernel
    culling bound runs only for listed objects. This is the TPU analogue
    of a broad-phase acceleration structure - the reference has only its
    empty Culling kernel stub (RayTracingManager.cu:46-51).

    Exclusion is CONSERVATIVE wrt the kernel's own lb test: an excluded
    sphere satisfies lb > far + 16*tau everywhere in the tile, i.e. its
    logit trails even the background's by > 16, identical to the weight
    floor the in-kernel culling already applies.
      - geometric: a missed ray pays penalty mp * (d_perp^2 - r^2) / r^2,
        so irrelevance needs d_perp > r * sqrt(1 + (far + 16 tau)/mp)
        =: r_eff; over the tile's ray cone d_perp >= dist * sin(angle
        between the center direction and the cone, floored at 0);
      - behind/inside: the t2-penalty only guarantees irrelevance beyond
        (far + 16 tau)/mp of the origin, so anything nearer is kept.

    The list is sorted near-to-far (distance of the sphere center from
    the ray origin): likely softmin winners run first, the running max
    logit m rises immediately, and the in-kernel bound then skips most
    of the tail - the ordering upgrade VERDICT r3 weak #2 asked for.

    disable=True skips the cone test (every active sphere listed, in
    index order) - the honest no-broad-phase baseline for the culling
    benchmark decomposition.

    Differentiation-neutral (computed under stop_gradient; excluded
    spheres have sub-floor weights and thus sub-ULP cotangents by the
    same bound the in-kernel culling relies on).

    Returns (table, aux) where aux = (t_hi_sph, sky_sph), per-tile
    [Ti, Tj] inputs of the depth-bounded shadow broad phase: t_hi_sph
    bounds any INCLUDED sphere's blended-depth contribution (max of
    dist + r over the tile's list; the quadratic root t2 <= dist + r
    always, miss or hit); sky_sph certifies that NO sphere reaches even
    relative weight e^-40 anywhere in the tile (the STRICT margin - vs
    the list's e^-16 - so a sky tile's whole object blend, values AND
    gradients, is bounded by N * e^-40 * shading_max: far below f32
    noise, which is what lets such tiles skip their shadow sweep
    entirely). aux is None when disable=True.
    """
    Ti, Tj = grid
    sph = jax.lax.stop_gradient(sph)
    cam = jax.lax.stop_gradient(cam)
    active = sph[P.S_ACTIVE] > 0.5
    if disable:
        incl = jnp.broadcast_to(active[None, :], (Ti * Tj, active.shape[0]))
        return _compact_lists(incl), None
    mp = config.soft_miss_penalty
    # hard=True builds lists for the hard closest-hit kernel
    # (render/pallas_kernel.py): no penalty influence, so a sphere is
    # irrelevant exactly when no tile ray can geometrically hit it
    # (r_eff = r, zero behind-origin reach).
    reach = 0.0 if hard else (config.far + 16.0 * tau) / mp
    r_scale = 1.0 if hard else jnp.sqrt(1.0 + (config.far + 16.0 * tau) / mp)

    axis, cos_cone, _ = (cones if cones is not None
                         else _tile_cones(cam, config, bh, bw, grid))
    cone = jnp.arccos(cos_cone)                                   # [Ti,Tj]

    centers = sph[P.S_CX:P.S_CZ + 1].T                            # [NS, 3]
    radius = sph[P.S_R]
    origin = cam[0, 0:3]
    v = centers - origin
    dist = jnp.linalg.norm(v, axis=-1)
    u = v / jnp.maximum(dist, 1e-12)[:, None]
    r_eff = radius * r_scale
    cosang = jnp.einsum("tjk,nk->tjn", axis, u)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))                 # [Ti,Tj,NS]
    alpha = jnp.arcsin(jnp.clip(r_eff / jnp.maximum(dist, 1e-12), 0.0, 1.0))
    geom = ang <= cone[..., None] + alpha[None, None, :]
    near = dist <= r_eff + reach                                  # behind/inside
    incl3 = (geom | near[None, None, :]) & active[None, None, :]
    t_hi_sph = jnp.max(
        jnp.where(incl3, (dist + radius)[None, None, :], 0.0), axis=-1)
    # strict (e^-40) variant of the same cone test for the sky-tile
    # certificate (see docstring); margin only changes r_eff/reach.
    r_eff40 = radius * jnp.sqrt(1.0 + (config.far + 40.0 * tau) / mp)
    reach40 = (config.far + 40.0 * tau) / mp
    alpha40 = jnp.arcsin(jnp.clip(r_eff40 / jnp.maximum(dist, 1e-12),
                                  0.0, 1.0))
    incl40 = ((ang <= cone[..., None] + alpha40[None, None, :])
              | (dist <= r_eff40 + reach40)[None, None, :]) \
        & active[None, None, :]
    sky_sph = jnp.logical_not(jnp.any(incl40, axis=-1))           # [Ti,Tj]
    incl = incl3.reshape(Ti * Tj, -1)                             # [T, NS]
    key = jnp.broadcast_to(dist[None, :], incl.shape)
    return _compact_lists(incl, sort_key=key), (t_hi_sph, sky_sph)


def _plane_depth_bounds(pl_, cam, config: RenderConfig, tau: float, d_raw):
    """Per-tile plane-depth data for the depth-bounded shadow broad
    phase: (t_hi_planes [Ti,Tj], covered [Ti,Tj]).

    t_hi_planes bounds every plane's possible blended-depth contribution
    over the tile's rays; covered certifies that some plane is hit by
    EVERY ray of the tile with t_eff <= far - 16*tau, i.e. the
    background competitor (logit -far/tau) is below the softmin weight
    floor everywhere - no "sky" weight, so no blended hit point can
    drift toward far.

    All certificates are corner-extremal and conservative:
      - the raw corner dirs d_raw are LINEAR in the NDC coords, so
        denom = d_raw.n is extremal at the tile's 4 corners; with a
        sign-consistent denom, t = num/denom (monotone in denom) and the
        hit coordinates h = o + d_raw * t_raw (linear over the convex
        plane-cone hit region) are corner-extremal too;
      - a plane is weight-irrelevant everywhere (contributes 0 to the
        depth bound) when a penalty's LINEAR lower bound
        pen(x) >= max(-x, 0) already exceeds (far + 16 tau)/mp at every
        corner: back-facing by margin, behind by margin, or out of
        bounds on one side by margin;
      - coverage uses the real softplus penalty at the corner-extremal
        worst-case constraint margins (the linear bound is too weak near
        zero margin): worst t + total penalty bound <= far - 16 tau - 1.
    """
    eps_sign = 1e-3
    far = config.far
    mp = config.soft_miss_penalty
    k = config.soft_mask_k
    sub = (far + 16.0 * tau) / mp   # linear-penalty irrelevance margin
    active = pl_[P.P_ACTIVE] > 0.5                                # [NP]
    origin = cam[0, 0:3]
    n = pl_[P.P_NX:P.P_NZ + 1].T                                  # [NP, 3]
    pc = pl_[P.P_CX:P.P_CZ + 1].T                                 # [NP, 3]
    hw = pl_[P.P_HW]
    hh = pl_[P.P_HH]
    dn = jnp.einsum("ijck,nk->ijcn", d_raw, n)                    # [Ti,Tj,4,NP]
    num = jnp.einsum("nk,nk->n", pc - origin[None, :], n)         # [NP]
    dnorm = jnp.linalg.norm(d_raw, axis=-1)                       # [Ti,Tj,4]
    dn_u = dn / dnorm[..., None]          # unit-dir denom (kernel scale)
    front_all = jnp.all(dn_u <= -eps_sign, axis=2)                # [Ti,Tj,NP]
    sign_ok = front_all | jnp.all(dn_u >= eps_sign, axis=2)
    safe_dn = jnp.where(jnp.abs(dn) < 1e-12, -1e-12, dn)
    t_raw = num[None, None, None, :] / safe_dn                    # [Ti,Tj,4,NP]
    t_norm = t_raw * dnorm[..., None]     # unit-dir ray parameter
    # hit coordinates at the corners (h = o + d_raw * t_raw exactly)
    ex = origin[0] + d_raw[..., 0][..., None] * t_raw - pc[None, None, None, :, 0]
    ez = origin[2] + d_raw[..., 2][..., None] * t_raw - pc[None, None, None, :, 2]
    t_in = sign_ok & jnp.all((t_norm >= 0.0) & (t_norm <= far), axis=2)

    # linear-bound irrelevance certificates, at margin m
    def irrelevant_at(m):
        back_all = jnp.all(dn_u >= m, axis=2)
        behind_all = sign_ok & jnp.all(t_norm <= -m, axis=2)
        oob = front_all & t_in & (
            jnp.all(ex >= hw + m, axis=2) | jnp.all(ex <= -(hw + m), axis=2)
            | jnp.all(ez >= hh + m, axis=2) | jnp.all(ez <= -(hh + m), axis=2))
        return back_all | behind_all | oob | ~active[None, None, :]

    irrelevant = irrelevant_at(sub)
    # strict (e^-40) variant for the sky-tile certificate
    planes_sky = jnp.all(irrelevant_at((far + 40.0 * tau) / mp), axis=-1)
    t_max = jnp.max(jnp.clip(t_norm, 0.0, far), axis=2)           # [Ti,Tj,NP]
    t_hi_pl = jnp.where(irrelevant, 0.0,
                        jnp.where(front_all & t_in, t_max, far))
    t_hi_planes = jnp.max(t_hi_pl, axis=-1)                       # [Ti,Tj]

    # coverage certificate: worst-case t_eff of this plane over the tile
    def pen(x):
        return jnp.logaddexp(-k * x, 0.0) / k

    eps = jnp.float32(_FLT_EPSILON)
    x1 = jnp.min(-dn, axis=2) / jnp.max(dnorm, axis=2)[..., None] - eps
    x2 = jnp.min(t_norm, axis=2)
    x3 = hw[None, None, :] - jnp.max(jnp.abs(ex), axis=2)
    x4 = hh[None, None, :] - jnp.max(jnp.abs(ez), axis=2)
    pen_total = mp * (pen(x1) + pen(x2) + pen(x3) + pen(x4))
    covered = (front_all & t_in & active[None, None, :]
               & (t_max + pen_total <= far - 16.0 * tau - 1.0))
    return t_hi_planes, jnp.any(covered, axis=-1), planes_sky


def _shadow_tile_lists(sph, pl_, cam, config: RenderConfig, tau: float,
                       bh: int, bw: int, grid, view_aux=None,
                       disable: bool = False, cones=None):
    """Per-tile shadow-occluder work lists: the DEPTH-BOUNDED light-cone
    counterpart of _sphere_tile_lists (VERDICT r3 missing #2 gave the
    shadow sweeps their broad phase; r5 bounds its depth - the r4-shaped
    hull assumed hit depths anywhere in [0, far], which kept ~20% of all
    occluders per tile while the per-ray gate then applied ~3%).

    A ray's shadow segment runs from its blended hit point P to the
    light L. P lies on the ray at the blended depth D - a convex
    combination of per-object t_clip values and the background's far. Per
    tile, D is bounded by t_hi = max(included spheres' dist + r, planes'
    corner-extremal depth bound) + margin WHENEVER some plane provably
    covers the whole tile closer than the background weight floor
    (_plane_depth_bounds; excluded objects contribute sub-floor weight
    <= N * 1e-7 * far < margin). Tiles with possible sky weight keep
    t_hi = far. So P lies in the tile's view cone truncated at t_hi, and
    the union of the tile's shadow segments is conv({L} u cone(t_hi)).
    An occluder is relevant only if it comes within its smoothed radius
    of that hull.

    The hull distance is lower-bounded by covering the truncated cone
    with _NB balls along its axis (ball i covers the depth slab
    [i, i+1] * t_hi/_NB: radius^2 = (t_hi/2NB)^2 + (t_i tan(cone))^2) -
    then conv({L} u cone) is contained in the union of the "ice cream
    cones" conv({L} u ball_i), and

        dist(C, conv({L} u ball_i)) >= dist(C, seg(L, c_i)) - R_i.

    An occluder sphere is kept iff for some ball the segment distance
    minus R_i is within

        r * sqrt(1 + 16/ks)   (sigmoid margin of the disc constraint:
                               block < ~1e-7 requires d_perp below this)
      + r + 16/ks             (closest-approach slack of the t2 and
                               dist-t2 segment-end constraints)
      + 0.02                  (the 1e-2 self-intersection ray offset)

    which makes exclusion conservative wrt the kernels' own per-ray
    min-constraint test (shadow_*_args > -16/ks): every excluded sphere
    has block < ~1e-7 for EVERY ray of the tile, i.e. transmittance
    within one float ULP of 1 and sub-ULP parameter cotangents.
    Plane occluders are not listed (NP is tiny; the kernels keep their
    full plane loop). Computed under stop_gradient; list order is
    index order (transmittances multiply - no early-out to help).
    """
    _NB = 8
    Ti, Tj = grid
    sph = jax.lax.stop_gradient(sph)
    pl_ = jax.lax.stop_gradient(pl_)
    cam = jax.lax.stop_gradient(cam)
    active = sph[P.S_ACTIVE] > 0.5
    NS = active.shape[0]
    if disable:
        incl = jnp.broadcast_to(active[None, :], (Ti * Tj, NS))
        return _compact_lists(incl)
    far = config.far
    ks = config.soft_shadow_k
    light = jnp.asarray(config.light_pos, jnp.float32)
    origin = cam[0, 0:3]

    axis, cos_cone, d_raw = (cones if cones is not None
                             else _tile_cones(cam, config, bh, bw, grid))
    # tan of the cone half-angle; the 0.05 floor on cos makes degenerate
    # super-wide tiles include everything instead of producing NaNs.
    tan_cone = (jnp.sqrt(jnp.maximum(1.0 - cos_cone * cos_cone, 0.0))
                / jnp.maximum(cos_cone, 0.05))                    # [Ti,Tj]

    t_hi_pl, covered, planes_sky = _plane_depth_bounds(pl_, cam, config,
                                                       tau, d_raw)
    if view_aux is None:
        t_hi_sph = jnp.full((Ti, Tj), far, jnp.float32)
        sky_sph = jnp.zeros((Ti, Tj), bool)
    else:
        t_hi_sph, sky_sph = view_aux
    t_cap = jnp.where(covered, jnp.maximum(t_hi_sph, t_hi_pl) + 1.0, far)
    t_cap = jnp.clip(t_cap, 1.0, far)                             # [Ti,Tj]
    # STRICT sky tiles (no sphere above relative weight e^-40 in the view
    # cone AND every plane strictly irrelevant): the whole object blend -
    # A, B, their vis jacobian, and every parameter cotangent - is
    # bounded by N * e^-40 * shading_max ~ 1e-13, so light visibility
    # cannot move anything above f32 noise; the tile needs NO occluders.
    skip = sky_sph & planes_sky                                   # [Ti,Tj]

    half = t_cap / (2.0 * _NB)                                    # [Ti,Tj]
    kk = jnp.arange(_NB, dtype=jnp.float32)
    t_mid = (kk * 2.0 + 1.0) * half[..., None]                    # [Ti,Tj,NB]
    t_sl = t_mid + half[..., None]
    cb = origin + axis[..., None, :] * t_mid[..., None]           # [Ti,Tj,NB,3]
    R = jnp.sqrt(half[..., None] ** 2 + (t_sl * tan_cone[..., None]) ** 2)

    # Point-to-segment distance, segments seg(L, c_i), points = centers.
    centers = sph[P.S_CX:P.S_CZ + 1].T                            # [NS, 3]
    radius = sph[P.S_R]
    v = cb - light                                                # [Ti,Tj,NB,3]
    w = centers - light                                           # [NS, 3]
    vv = jnp.sum(v * v, -1)                                       # [Ti,Tj,NB]
    ww = jnp.sum(w * w, -1)                                       # [NS]
    wv = jnp.einsum("ijbk,nk->ijbn", v, w)                        # [Ti,Tj,NB,NS]
    t = jnp.clip(wv / jnp.maximum(vv, 1e-12)[..., None], 0.0, 1.0)
    d2 = ww[None, None, None, :] - 2.0 * t * wv + t * t * vv[..., None]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))                            # [Ti,Tj,NB,NS]

    # sqrt(1 + 16/ks): the disc-constraint margin matching the kernels'
    # per-ray gate (shadow_*_args > -16/ks) for EVERY soft_shadow_k, not
    # just ks >= ~6 (a 4/ks margin only covers the gap via the added
    # radius slack when ks is large enough; 16/ks is strictly
    # conservative and costs nothing - this runs once per frame).
    r_keep = radius * jnp.sqrt(1.0 + 16.0 / ks) + radius + 16.0 / ks + 0.02
    incl = jnp.any(d - R[..., None] <= r_keep[None, None, None, :], axis=2)
    incl = incl & active[None, None, :] & jnp.logical_not(skip)[..., None]
    incl = incl.reshape(Ti * Tj, NS)
    return _compact_lists(incl)


def _build_tile_lists(sph, pl_, cam, config: RenderConfig, tau: float,
                      bh: int, bw: int, grid, shadows: bool,
                      disable: bool = False):
    """Both broad-phase tables from ONE cone computation (the view and
    shadow builders share _tile_cones; every step rebuilds lists, so the
    shared geometry is computed once - ~20% off the in-jit list-build
    cost). Returns (view_table, shadow_table_or_None)."""
    cones = None if disable else _tile_cones(cam, config, bh, bw, grid)
    table, aux = _sphere_tile_lists(sph, cam, config, tau, bh, bw, grid,
                                    disable=disable, cones=cones)
    if not shadows:
        return table, None
    shl = _shadow_tile_lists(sph, pl_, cam, config, tau, bh, bw, grid,
                             view_aux=aux, disable=disable, cones=cones)
    return table, shl


# Forward shadow-sweep early-out threshold: once EVERY ray of a tile has
# vis <= this, further occluders cannot change the image (direct light
# contributes vis * B <= 1e-7 * B ~ 2e-4 worst case in the 0..255
# domain - under every parity tolerance; transmittances only shrink
# vis), so the sweep skips its heavy branches - the soft analogue of the
# hard renderer's any-occluder early return (VERDICT r4 next #7). Equal
# to _TRANS_FLOOR: a tile triggers exactly when every ray has met a
# fully-blocking occluder (times near-1 partials), i.e. the heavily-
# shadowed regime the early-out targets. Forward value path only; the
# backward keeps exact gating.
_VIS_EARLY_OUT = 1e-7
# Hard cap on clamp-correction cache slots (VMEM budget guard; the
# per-tile demand is measured by the stats output, bench.py reports it).
_CACHE_SLOT_CAP = 32


def _shadow_vis_sweep(fns, cull, bh, bw, sph_ref, pl_ref, shlst_ref, n_pl, lr,
                      count_applied: bool = False, gate_store=None):
    """Light-visibility product over the tile's shadow work list then the
    planes (shared by the shadowed forward and the one-pass fused MSE
    kernel). Two-level occluder culling: the sphere loop runs over the
    light-cone broad-phase list (_shadow_tile_lists) and one solve per
    listed occluder (shadow_*_pre, light ray hoisted) yields both the
    per-ray constraint bound and the sigmoid arguments; occluders whose
    min constraint stays below -16/ks everywhere block < ~1e-7 and skip
    the 4-sigmoid transmittance. With culling on, the loops additionally
    carry an all-dark flag: once every ray of the tile has vis <=
    _VIS_EARLY_OUT, remaining occluders skip their transmittance heavy
    branch entirely (the flag is refreshed ONLY inside the heavy branch -
    one tile-max per applied occluder - so lit tiles, the common case,
    pay nothing; a while_loop break was measured SLOWER here because its
    per-iteration condition reduce taxed exactly the common case).
    cull=False runs the exact fori_loop sweeps (the honest no-credit
    baseline).

    count_applied=True additionally returns the number of occluders whose
    transmittance heavy branch actually RAN (the per-tile applied count,
    for the list-aware roofline diagnostics; production passes False and
    pays nothing).

    gate_store(idx, int32) records each occluder's GEOMETRIC relevance
    bit (pre-darkness; spheres at idx = k, planes at idx = NS + k) so a
    backward pass can reuse the gates instead of re-running the
    per-occluder pre solves (the predicates are identical)."""
    rel_floor = -16.0 / fns.shadow_ks
    NS = sph_ref.shape[1]

    def sphere_step(jj, carry):
        vis, dark, napp = carry
        k = shlst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])

        if not cull:
            if gate_store is not None:
                gate_store(k, jnp.int32(1))
            _, args = fns.shadow_sphere_pre(*geo, lr)
            v, _, n = carry
            v = v * fns.shadow_transmittance(args)
            return v, jnp.max(v) <= _VIS_EARLY_OUT, n + 1

        # split gate: the sqrt-free stage A (disc constraint) kills most
        # listed-but-irrelevant occluders; survivors run the root +
        # remaining constraints in stage B (identical composition).
        disc, dss, b, dist = fns.shadow_sphere_preA(*geo, lr)
        relA = jnp.max(dss) > rel_floor

        def stageB(c):
            min_arg, args = fns.shadow_sphere_preB(disc, dss, b, dist)
            rel_geo = jnp.max(min_arg) > rel_floor
            if gate_store is not None:
                gate_store(k, rel_geo.astype(jnp.int32))
            rel = rel_geo & jnp.logical_not(dark)

            def heavy(cc):
                v, _, n = cc
                v = v * fns.shadow_transmittance(args)
                return v, jnp.max(v) <= _VIS_EARLY_OUT, n + 1

            return jax.lax.cond(rel, heavy, lambda cc: cc, c)

        def skipA(c):
            if gate_store is not None:
                gate_store(k, jnp.int32(0))
            return c

        return jax.lax.cond(relA, stageB, skipA, carry)

    def plane_step(k, carry):
        vis, dark, napp = carry
        min_arg, args = fns.shadow_plane_pre(
            pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
            pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
            pl_ref[P.P_HW, k], pl_ref[P.P_HH, k], lr)

        def heavy(c):
            v, _, n = c
            v = v * fns.shadow_transmittance(args)
            return v, jnp.max(v) <= _VIS_EARLY_OUT, n + 1

        if not cull:
            if gate_store is not None:
                gate_store(NS + k, jnp.int32(1))
            return heavy(carry)
        rel_geo = jnp.max(min_arg) > rel_floor
        if gate_store is not None:
            gate_store(NS + k, rel_geo.astype(jnp.int32))
        rel = rel_geo & jnp.logical_not(dark)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    carry = (jnp.ones((bh, bw), jnp.float32), jnp.zeros((), jnp.bool_),
             jnp.zeros((), jnp.int32))
    n_sh = shlst_ref[0, 0, 0]
    # PLANES FIRST (the transmittance product commutes): the few plane
    # occluders are the likely full blockers (a roof/slab), so running
    # them first lets the all-dark flag skip the whole sphere list.
    # Measured honestly (benchmarks/earlyout_ablation.py): the gain is
    # bounded - ~1.03x forward on an adversarial fully-dark cluster
    # scene, parity-neutral and free on lit scenes - because the broad
    # phase + per-ray gates already remove most of what darkness would
    # skip, and the backward (exact gating, no early-out) dominates
    # dark-scene cost.
    carry = jax.lax.fori_loop(0, n_pl, plane_step, carry)
    vis, _, napp = jax.lax.fori_loop(0, n_sh, sphere_step, carry)
    if count_applied:
        return vis, napp
    return vis


def _clamp_blend_from_cache(fns, cache_ref, ccol_ref, count, m, inv_s,
                            inv_tau, vis, acc, zero):
    """Exact clamped color blend + d(rgb)/d(vis) from the sweep-1 cache:
    per slot, rebuild the ambient/direct parts from the cached
    (dterm, sterm) planes and SMEM color scalars (identical expressions
    to sweep 1 - bit-exact) and accumulate the over-255 correction.
    Returns (r, g, b, dvis_r, dvis_g, dvis_b)."""
    def corr_body(slot, carry):
        t_eff = cache_ref[slot, 0]
        parts = fns.parts_from_terms(
            cache_ref[slot, 1], cache_ref[slot, 2],
            ccol_ref[slot, 0], ccol_ref[slot, 1], ccol_ref[slot, 2])
        w = jnp.exp(-t_eff * inv_tau - m) * inv_s
        out = list(carry)
        for c in range(3):
            a_c, b_c = parts[c]
            val = a_c + vis * b_c
            over = val >= 255.0
            out[c] = out[c] + w * jnp.where(over, val - 255.0, 0.0)
            out[3 + c] = out[3 + c] + w * jnp.where(over, b_c, 0.0)
        return tuple(out)

    corr = jax.lax.fori_loop(0, count, corr_body, (zero,) * 6)
    a_rgb = tuple(acc[4 + c] * inv_s for c in range(3))
    b_rgb = tuple(acc[7 + c] * inv_s for c in range(3))
    return (a_rgb[0] + vis * b_rgb[0] - corr[0],
            a_rgb[1] + vis * b_rgb[1] - corr[1],
            a_rgb[2] + vis * b_rgb[2] - corr[2],
            b_rgb[0] - corr[3], b_rgb[1] - corr[4], b_rgb[2] - corr[5])


def _clamp_blend_fallback(fns, cull, sph_ref, pl_ref, lst_ref, n_pl, m,
                          inv_s, inv_tau, vis, dx, dy, dz, ox, oy, oz, zero):
    """Cache-overflow path: the exact re-walk of the retired 3-sweep
    design (full object sweep re-deriving each culled-in object's shading
    parts), gated by the same culling bound against the FINAL max m and
    reusing the bound's solve (lb_ex -> geo_post, single solve)."""
    def shade_accumulate(carry, t_eff, col, point, normal):
        w = jnp.exp(-t_eff * inv_tau - m) * inv_s
        parts = fns.shade_parts(*col, *point, *normal, dx, dy, dz)
        out = []
        for c in range(3):
            a_c, b_c = parts[c]
            val = a_c + vis * b_c
            gate = (val < 255.0).astype(jnp.float32)
            out.append(carry[c] + w * jnp.minimum(255.0, val))
            out.append(carry[3 + c] + w * b_c * gate)
        return (out[0], out[2], out[4], out[1], out[3], out[5])

    def sphere_col_body(jj, carry):
        k = lst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        col = (sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k])

        if not cull:
            t_eff, _, nx, ny, nz, hx, hy, hz = fns.sphere_geo(
                *geo, dx, dy, dz, ox, oy, oz)
            return shade_accumulate(carry, t_eff, col, (hx, hy, hz),
                                    (nx, ny, nz))
        lb, t2, dss = fns.sphere_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

        def heavy(c):
            t_eff, _, nx, ny, nz, hx, hy, hz = fns.sphere_geo_post(
                geo[0], geo[1], geo[2], t2, dss, dx, dy, dz, ox, oy, oz)
            return shade_accumulate(c, t_eff, col, (hx, hy, hz), (nx, ny, nz))

        rel = jnp.max(-lb * inv_tau - m) > _CULL_LOG_EPS
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    def plane_col_body(k, carry):
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        col = (pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k])

        if not cull:
            t_eff, _, nx, ny, nz, hx, hy, hz = fns.plane_geo(
                *geo, dx, dy, dz, ox, oy, oz)
            return shade_accumulate(carry, t_eff, col, (hx, hy, hz),
                                    fns.plane_unit_n(*geo[3:6]))
        lb, t, denom, pxp, pzp = fns.plane_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

        def heavy(c):
            t_eff, _, nx, ny, nz, hx, hy, hz = fns.plane_geo_post(
                *geo, t, denom, pxp, pzp, dx, dy, dz, ox, oy, oz)
            return shade_accumulate(c, t_eff, col, (hx, hy, hz),
                                    fns.plane_unit_n(*geo[3:6]))

        rel = jnp.max(-lb * inv_tau - m) > _CULL_LOG_EPS
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    rgb_dv = jax.lax.fori_loop(0, lst_ref[0, 0, 0], sphere_col_body,
                               (zero,) * 6)
    return jax.lax.fori_loop(0, n_pl, plane_col_body, rgb_dv)


def _soft_fwd_body(config: RenderConfig, tau: float, bh: int, bw: int,
                   cull: bool,
                   cam_ref, sph_ref, pl_ref, lst_ref, out_ref, gate_ref):
    fns = _make_object_fns(config, tau)
    sphere_f, plane_f = fns.sphere_f, fns.plane_f
    sphere_lb, plane_lb = fns.sphere_lb, fns.plane_lb
    raygen = _make_raygen(config, bh, bw)
    i, j = pl.program_id(0), pl.program_id(1)

    ox, oy, oz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cam9 = tuple(cam_ref[0, idx] for idx in range(3, 12))
    row0 = cam_ref[0, C_ROW0]
    dx, dy, dz = raygen(i, j, row0, *cam9)

    inv_tau = jnp.float32(1.0 / tau)
    bg_logit = jnp.float32(-config.far / tau)

    # Online softmin state: m (running max logit), s (sum of exp), and
    # exp-weighted accumulators. Background seeds the state.
    m = jnp.full((bh, bw), bg_logit, jnp.float32)
    s = jnp.ones((bh, bw), jnp.float32)
    acc = (jnp.zeros((bh, bw), jnp.float32),) * 3 + (
        jnp.full((bh, bw), jnp.float32(config.far)),) + (
        jnp.zeros((bh, bw), jnp.float32),) * 3

    def accumulate(state, values):
        m, s, acc = state
        t_eff, r_, g_, b_, t_clip, nx, ny, nz = values
        logit = -t_eff * inv_tau
        m_new = jnp.maximum(m, logit)
        # Of alpha = exp(m - m_new) and p = exp(logit - m_new), one is
        # always 1 (m_new is whichever argument won the max), so a single
        # exp of -|logit - m| serves both - exact, and one VPU
        # transcendental per object instead of two.
        e = jnp.exp(-jnp.abs(logit - m))
        up = logit > m
        alpha_ = jnp.where(up, e, 1.0)
        p = jnp.where(up, 1.0, e)
        s = s * alpha_ + p
        v = (r_, g_, b_, t_clip, nx, ny, nz)
        acc = tuple(a * alpha_ + p * vi for a, vi in zip(acc, v))
        return m_new, s, acc

    # Two-level per-tile culling: the sphere loop runs over THIS TILE's
    # work list (the broad-phase cone prepass, _sphere_tile_lists - one
    # SMEM scalar read per listed object instead of an O(N) sweep), and
    # each listed object still passes the cheap t_eff lower-bound test:
    # can it reach relative softmin weight > exp(_CULL_LOG_EPS) anywhere
    # in the tile vs the RUNNING max logit (conservative: m only grows, so
    # a skip stays a skip under the final normalizer)? Only then run the
    # REMAINDER of intersect + shade + accumulate: the bound's quadratic /
    # plane solve (incl. the sqrt - the costliest VPU op here) is
    # threaded through the cond and NOT recomputed (sphere_lb_ex ->
    # sphere_f_post; VERDICT r4 weak #1).
    def sphere_body(jj, state):
        k = lst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        col = (sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k])

        if not cull:
            # no-culling-credit baseline: the single-solve full path;
            # gates saved as all-relevant so a gate-reading backward
            # stays correct under mixed cull flags
            gate_ref[0, 0, k] = 1
            return accumulate(state, sphere_f(*geo, *col, dx, dy, dz,
                                              ox, oy, oz))
        lb, t2, dss = fns.sphere_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

        def heavy(st):
            vals = fns.sphere_f_post(geo[0], geo[1], geo[2], t2, dss, *col,
                                     dx, dy, dz, ox, oy, oz)
            return accumulate(st, vals)

        rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
        gate_ref[0, 0, k] = rel.astype(jnp.int32)
        return jax.lax.cond(rel, heavy, lambda st: st, state)

    def plane_body(k, state):
        NS = sph_ref.shape[1]
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        col = (pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k])

        if not cull:
            gate_ref[0, 0, NS + k] = 1
            return accumulate(state, plane_f(*geo, *col, dx, dy, dz,
                                             ox, oy, oz))
        lb, t, denom, pxp, pzp = fns.plane_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

        def heavy(st):
            vals = fns.plane_f_post(*geo, t, denom, pxp, pzp, *col,
                                    dx, dy, dz, ox, oy, oz)
            return accumulate(st, vals)

        rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
        gate_ref[0, 0, NS + k] = rel.astype(jnp.int32)
        return jax.lax.cond(rel, heavy, lambda st: st, state)

    n_live = lst_ref[0, 0, 0]
    n_pl = cam_ref[0, C_NPL].astype(jnp.int32)
    state = (m, s, acc)
    state = jax.lax.fori_loop(0, n_live, sphere_body, state)
    m, s, acc = jax.lax.fori_loop(0, n_pl, plane_body, state)

    inv_s = 1.0 / s
    out_ref[SO_R] = acc[0] * inv_s
    out_ref[SO_G] = acc[1] * inv_s
    out_ref[SO_B] = acc[2] * inv_s
    out_ref[SO_DEPTH] = acc[3] * inv_s
    out_ref[SO_NX] = acc[4] * inv_s
    out_ref[SO_NY] = acc[5] * inv_s
    out_ref[SO_NZ] = acc[6] * inv_s
    out_ref[SO_ALPHA] = 1.0 - jnp.exp(bg_logit - m) * inv_s
    out_ref[SO_M] = m
    out_ref[SO_S] = s


def _soft_bwd_body(config: RenderConfig, tau: float, bh: int, bw: int,
                   cull: bool,
                   cam_ref, sph_ref, pl_ref, lst_ref, gate_ref, sav_ref,
                   g_ref, dsph_ref, dpl_ref, dcam_ref):
    fns = _make_object_fns(config, tau)
    sphere_f, plane_f = fns.sphere_f, fns.plane_f
    sphere_lb, plane_lb = fns.sphere_lb, fns.plane_lb
    raygen = _make_raygen(config, bh, bw)
    i, j = pl.program_id(0), pl.program_id(1)
    NS = sph_ref.shape[1]
    NP = pl_ref.shape[1]

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _init():
        # dsph/dpl live in VMEM (vector zero-init is fine there); dcam is
        # SMEM, which only admits scalar stores - unrolled 16 of them.
        dsph_ref[...] = jnp.zeros(dsph_ref.shape, dsph_ref.dtype)
        dpl_ref[...] = jnp.zeros(dpl_ref.shape, dpl_ref.dtype)
        for idx in range(P.CAM_LEN):
            dcam_ref[0, idx] = 0.0   # compensated sum
            dcam_ref[1, idx] = 0.0   # running compensation

    ox, oy, oz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cam9 = tuple(cam_ref[0, idx] for idx in range(3, 12))
    row0 = cam_ref[0, C_ROW0]
    dx, dy, dz, vxp, vyp, rinv = raygen.full(i, j, row0, *cam9)

    inv_tau = jnp.float32(1.0 / tau)
    bg_logit = jnp.float32(-config.far / tau)
    m = sav_ref[SO_M]
    s = sav_ref[SO_S]
    inv_s = 1.0 / s
    out_rgb = (sav_ref[SO_R], sav_ref[SO_G], sav_ref[SO_B])
    out_depth = sav_ref[SO_DEPTH]
    out_norm = (sav_ref[SO_NX], sav_ref[SO_NY], sav_ref[SO_NZ])
    g_rgb = (g_ref[SO_R], g_ref[SO_G], g_ref[SO_B])
    g_depth = g_ref[SO_DEPTH]
    g_norm = (g_ref[SO_NX], g_ref[SO_NY], g_ref[SO_NZ])
    g_alpha = g_ref[SO_ALPHA]

    w_bg = jnp.exp(bg_logit - m) * inv_s
    # S = sum_j w_j (g . v_j) over all competitors incl. background
    # (closed-form via the saved outputs; see module docstring).
    S = (g_rgb[0] * out_rgb[0] + g_rgb[1] * out_rgb[1] + g_rgb[2] * out_rgb[2]
         + g_depth * out_depth
         + g_norm[0] * out_norm[0] + g_norm[1] * out_norm[1]
         + g_norm[2] * out_norm[2]
         - g_alpha * w_bg)

    def cotangents(vals):
        """(dL/d t_eff, dL/d rgb, dL/d t_clip, dL/d n) for one object."""
        t_eff, r_, g_, b_, t_clip, nx, ny, nz = vals
        w = jnp.exp(-t_eff * inv_tau - m) * inv_s
        gdotv = (g_rgb[0] * r_ + g_rgb[1] * g_ + g_rgb[2] * b_
                 + g_depth * t_clip
                 + g_norm[0] * nx + g_norm[1] * ny + g_norm[2] * nz)
        dlogit = w * (gdotv - S)
        ct_teff = -dlogit * inv_tau
        return (ct_teff, w * g_rgb[0], w * g_rgb[1], w * g_rgb[2],
                w * g_depth, w * g_norm[0], w * g_norm[1], w * g_norm[2])

    # Per-object scalar grads cannot be dynamically scattered on TPU
    # (no vector stores to SMEM, no dynamic-index vector scatter); instead
    # each is splatted into its table column with a one-hot lane mask and
    # summed into loop-carried (1, N) vectors - 7 (11) masked FMAs per
    # object on tiny vectors, negligible next to the ray-tile math.
    sph_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NS), 1)
    pl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)

    # Same two-level culling as the forward pass (the tile's broad-phase
    # work list bounds the loop), with the per-object gate READ from the
    # forward kernel's saved gate table (r5: the forward just evaluated
    # the same bound; its running-max decision is a SUPERSET of the exact
    # final-max gate, so reuse is conservative and the lb re-solve per
    # listed object disappears from the backward).
    def sphere_body(jj, carry):
        k = lst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        rel = gate_ref[0, 0, k] == 1

        def heavy(c):
            gdx, gdy, gdz, gox, goy, goz, dsph, dpl = c
            args = (*geo,
                    sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k],
                    dx, dy, dz, ox, oy, oz)
            vals, fvjp = jax.vjp(sphere_f, *args)
            grads = fvjp(cotangents(vals))
            onehot = (sph_iota == k).astype(jnp.float32)
            # grads[0..6] align with table rows S_CX..S_COLB (= 0..6);
            # row 7 (S_ACTIVE) takes no gradient.
            dsph = tuple(
                (acc + onehot * grads[row]) if row < 7 else acc
                for row, acc in enumerate(dsph)
            )
            return (gdx + grads[7], gdy + grads[8], gdz + grads[9],
                    gox + grads[10], goy + grads[11], goz + grads[12],
                    dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    def plane_body(k, carry):
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        rel = gate_ref[0, 0, NS + k] == 1

        def heavy(c):
            gdx, gdy, gdz, gox, goy, goz, dsph, dpl = c
            args = (*geo,
                    pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k],
                    dx, dy, dz, ox, oy, oz)
            vals, fvjp = jax.vjp(plane_f, *args)
            grads = fvjp(cotangents(vals))
            onehot = (pl_iota == k).astype(jnp.float32)
            # grads[0..10] align with table rows P_CX..P_COLB (= 0..10);
            # row 11 (P_ACTIVE) takes no gradient.
            dpl = tuple(
                (acc + onehot * grads[row]) if row < 11 else acc
                for row, acc in enumerate(dpl)
            )
            return (gdx + grads[11], gdy + grads[12], gdz + grads[13],
                    gox + grads[14], goy + grads[15], goz + grads[16],
                    dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    n_live = lst_ref[0, 0, 0]
    n_pl = cam_ref[0, C_NPL].astype(jnp.int32)
    zero = jnp.zeros((bh, bw), jnp.float32)
    carry = (zero, zero, zero,
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
             tuple(jnp.zeros((1, NS), jnp.float32) for _ in range(P.SPH_ROWS)),
             tuple(jnp.zeros((1, NP), jnp.float32) for _ in range(P.PL_ROWS)))
    carry = jax.lax.fori_loop(0, n_live, sphere_body, carry)
    carry = jax.lax.fori_loop(0, n_pl, plane_body, carry)
    gdx, gdy, gdz, gox, goy, goz, dsph_rows, dpl_rows = carry

    dsph_ref[...] += jnp.concatenate(dsph_rows, axis=0)
    dpl_ref[...] += jnp.concatenate(dpl_rows, axis=0)

    # Hand-written raygen VJP: d = p * rsqrt(p.p) => dL/dp = rinv*(g-(g.d)d),
    # then each basis-element grad is the plane sum of gp * {vx, vy, 1}.
    # Those sums are catastrophically cancellative (vx is antisymmetric
    # across the image; condition ~1e5, so ANY plain-f32 reduce - including
    # jax.vjp's - loses ~20% vs f64): reduce with two-float compensation
    # and accumulate across tiles with Kahan adds (hi then lo).
    sd = gdx * dx + gdy * dy + gdz * dz
    gps = (rinv * (gdx - dx * sd),
           rinv * (gdy - dy * sd),
           rinv * (gdz - dz * sd))
    for idx, gval in enumerate((gox, goy, goz)):
        _kahan_add(dcam_ref, idx, gval)
    for c, gp in enumerate(gps):
        for k, wplane in enumerate((vxp, vyp, None)):
            hi, lo = _twofloat_plane_sum(gp if wplane is None else gp * wplane)
            _kahan_add(dcam_ref, 3 + 3 * c + k, hi)
            _kahan_add(dcam_ref, 3 + 3 * c + k, lo)


def _soft_sh_bwd_body(config: RenderConfig, tau: float, bh: int, bw: int,
                      cull: bool,
                      cam_ref, sph_ref, pl_ref, lst_ref, shlst_ref,
                      gate_ref, sav_ref, g_ref, dsph_ref, dpl_ref,
                      dcam_ref):
    """Shadowed backward. Three gradient paths compose:

      1. value path through vis:  dL/dvis = sum_c g_rgb_c * saved dvis_c
         (the forward saved the clamp-gated direct-light blend);
      2. the shadow sweep's vjp at P = o + d*D turns dL/dvis into occluder
         geometry grads, camera grads (through o and d), and a cotangent on
         the blended depth ct_D = ctP . d (the product-rule term
         d vis/d f_j = vis / f_j is exact for the floored transmittances);
      3. the ordinary closed-form softmax vjp over objects, with the depth
         cotangent upgraded to g_depth + ct_D and per-object values
         rgb_k = min(255, A_k + vis * B_k) (vis closed over as a constant -
         its cotangent is path 1, counting it here would double it)."""
    fns = _make_object_fns(config, tau)
    raygen = _make_raygen(config, bh, bw)
    i, j = pl.program_id(0), pl.program_id(1)
    NS = sph_ref.shape[1]
    NP = pl_ref.shape[1]

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _init():
        dsph_ref[...] = jnp.zeros(dsph_ref.shape, dsph_ref.dtype)
        dpl_ref[...] = jnp.zeros(dpl_ref.shape, dpl_ref.dtype)
        for idx in range(P.CAM_LEN):
            dcam_ref[0, idx] = 0.0   # compensated sum
            dcam_ref[1, idx] = 0.0   # running compensation

    ox, oy, oz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cam9 = tuple(cam_ref[0, idx] for idx in range(3, 12))
    row0 = cam_ref[0, C_ROW0]
    dx, dy, dz, vxp, vyp, rinv = raygen.full(i, j, row0, *cam9)

    inv_tau = jnp.float32(1.0 / tau)
    bg_logit = jnp.float32(-config.far / tau)
    ks = fns.shadow_ks
    m = sav_ref[SO_M]
    s = sav_ref[SO_S]
    inv_s = 1.0 / s
    vis = sav_ref[SO_VIS]
    out_rgb = (sav_ref[SO_R], sav_ref[SO_G], sav_ref[SO_B])
    out_depth = sav_ref[SO_DEPTH]
    out_norm = (sav_ref[SO_NX], sav_ref[SO_NY], sav_ref[SO_NZ])
    g_rgb = (g_ref[SO_R], g_ref[SO_G], g_ref[SO_B])
    g_norm = (g_ref[SO_NX], g_ref[SO_NY], g_ref[SO_NZ])
    g_alpha = g_ref[SO_ALPHA]

    # Path 1: dL/dvis from the saved value-path jacobian planes.
    g_vis = (g_rgb[0] * sav_ref[SO_DVR] + g_rgb[1] * sav_ref[SO_DVG]
             + g_rgb[2] * sav_ref[SO_DVB])

    # Path 2: shadow-sweep vjp at the blended hit point.
    D = out_depth
    px_b = ox + dx * D
    py_b = oy + dy * D
    pz_b = oz + dz * D
    # Per-occluder relevance gates are READ from the forward kernel's
    # saved gate table (identical predicates, r5); the heavy branches
    # still replay shadow_*_f under jax.vjp - the solve must be on the
    # tape there.

    n_pl = cam_ref[0, C_NPL].astype(jnp.int32)
    sph_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NS), 1)
    pl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)
    zero = jnp.zeros((bh, bw), jnp.float32)

    # The shadow sweep runs over the tile's shadow work list (light-cone
    # broad phase, _shadow_tile_lists); listed occluders still pass the
    # per-ray min-constraint gate before the expensive vjp replay.
    def sh_sphere_body(jj, carry):
        k = shlst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        rel = gate_ref[0, 1, k] == 1

        def heavy(c):
            ctx, cty, ctz, dsph, dpl = c
            f_j, fvjp = jax.vjp(fns.shadow_sphere_f, *geo, px_b, py_b, pz_b)
            grads = fvjp(g_vis * vis / f_j)
            onehot = (sph_iota == k).astype(jnp.float32)
            dsph = tuple(
                (acc + onehot * grads[row]) if row < 4 else acc
                for row, acc in enumerate(dsph)
            )
            return (ctx + grads[4], cty + grads[5], ctz + grads[6], dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    def sh_plane_body(k, carry):
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        rel = gate_ref[0, 1, NS + k] == 1

        def heavy(c):
            ctx, cty, ctz, dsph, dpl = c
            f_j, fvjp = jax.vjp(fns.shadow_plane_f, *geo, px_b, py_b, pz_b)
            grads = fvjp(g_vis * vis / f_j)
            onehot = (pl_iota == k).astype(jnp.float32)
            dpl = tuple(
                (acc + onehot * grads[row]) if row < 8 else acc
                for row, acc in enumerate(dpl)
            )
            return (ctx + grads[8], cty + grads[9], ctz + grads[10], dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    sh_carry = (zero, zero, zero,
                tuple(jnp.zeros((1, NS), jnp.float32) for _ in range(P.SPH_ROWS)),
                tuple(jnp.zeros((1, NP), jnp.float32) for _ in range(P.PL_ROWS)))
    sh_carry = jax.lax.fori_loop(0, shlst_ref[0, 0, 0], sh_sphere_body,
                                 sh_carry)
    ct_px, ct_py, ct_pz, dsph0, dpl0 = jax.lax.fori_loop(
        0, n_pl, sh_plane_body, sh_carry)

    ct_d = ct_px * dx + ct_py * dy + ct_pz * dz
    g_depth = g_ref[SO_DEPTH] + ct_d  # blended depth feeds the shadow point

    # Path 3: closed-form softmax vjp (g_depth now carries the shadow term).
    w_bg = jnp.exp(bg_logit - m) * inv_s
    S = (g_rgb[0] * out_rgb[0] + g_rgb[1] * out_rgb[1] + g_rgb[2] * out_rgb[2]
         + g_depth * out_depth
         + g_norm[0] * out_norm[0] + g_norm[1] * out_norm[1]
         + g_norm[2] * out_norm[2]
         - g_alpha * w_bg)

    def cotangents(vals):
        t_eff, r_, g_, b_, t_clip, nx, ny, nz = vals
        w = jnp.exp(-t_eff * inv_tau - m) * inv_s
        gdotv = (g_rgb[0] * r_ + g_rgb[1] * g_ + g_rgb[2] * b_
                 + g_depth * t_clip
                 + g_norm[0] * nx + g_norm[1] * ny + g_norm[2] * nz)
        dlogit = w * (gdotv - S)
        ct_teff = -dlogit * inv_tau
        return (ct_teff, w * g_rgb[0], w * g_rgb[1], w * g_rgb[2],
                w * g_depth, w * g_norm[0], w * g_norm[1], w * g_norm[2])

    def sphere_body(jj, carry):
        k = lst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        rel = gate_ref[0, 0, k] == 1

        def heavy(c):
            gdx, gdy, gdz, gox, goy, goz, dsph, dpl = c
            args = (*geo,
                    sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k],
                    dx, dy, dz, ox, oy, oz)
            vals, fvjp = jax.vjp(
                lambda *a: fns.sphere_f(*a, vis=vis), *args)
            grads = fvjp(cotangents(vals))
            onehot = (sph_iota == k).astype(jnp.float32)
            dsph = tuple(
                (acc + onehot * grads[row]) if row < 7 else acc
                for row, acc in enumerate(dsph)
            )
            return (gdx + grads[7], gdy + grads[8], gdz + grads[9],
                    gox + grads[10], goy + grads[11], goz + grads[12],
                    dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    def plane_body(k, carry):
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        rel = gate_ref[0, 0, NS + k] == 1

        def heavy(c):
            gdx, gdy, gdz, gox, goy, goz, dsph, dpl = c
            args = (*geo,
                    pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k],
                    dx, dy, dz, ox, oy, oz)
            vals, fvjp = jax.vjp(
                lambda *a: fns.plane_f(*a, vis=vis), *args)
            grads = fvjp(cotangents(vals))
            onehot = (pl_iota == k).astype(jnp.float32)
            dpl = tuple(
                (acc + onehot * grads[row]) if row < 11 else acc
                for row, acc in enumerate(dpl)
            )
            return (gdx + grads[11], gdy + grads[12], gdz + grads[13],
                    gox + grads[14], goy + grads[15], goz + grads[16],
                    dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    # Seed the main sweep with the shadow sweep's results: d cotangent
    # ctP * D (P = o + d*D), origin cotangent ctP itself.
    carry = (ct_px * D, ct_py * D, ct_pz * D,
             jnp.sum(ct_px), jnp.sum(ct_py), jnp.sum(ct_pz),
             dsph0, dpl0)
    carry = jax.lax.fori_loop(0, lst_ref[0, 0, 0], sphere_body, carry)
    carry = jax.lax.fori_loop(0, n_pl, plane_body, carry)
    gdx, gdy, gdz, gox, goy, goz, dsph_rows, dpl_rows = carry

    dsph_ref[...] += jnp.concatenate(dsph_rows, axis=0)
    dpl_ref[...] += jnp.concatenate(dpl_rows, axis=0)

    # Hand-written raygen VJP: d = p * rsqrt(p.p) => dL/dp = rinv*(g-(g.d)d),
    # then each basis-element grad is the plane sum of gp * {vx, vy, 1}.
    # Those sums are catastrophically cancellative (vx is antisymmetric
    # across the image; condition ~1e5, so ANY plain-f32 reduce - including
    # jax.vjp's - loses ~20% vs f64): reduce with two-float compensation
    # and accumulate across tiles with Kahan adds (hi then lo).
    sd = gdx * dx + gdy * dy + gdz * dz
    gps = (rinv * (gdx - dx * sd),
           rinv * (gdy - dy * sd),
           rinv * (gdz - dz * sd))
    for idx, gval in enumerate((gox, goy, goz)):
        _kahan_add(dcam_ref, idx, gval)
    for c, gp in enumerate(gps):
        for k, wplane in enumerate((vxp, vyp, None)):
            hi, lo = _twofloat_plane_sum(gp if wplane is None else gp * wplane)
            _kahan_add(dcam_ref, 3 + 3 * c + k, hi)
            _kahan_add(dcam_ref, 3 + 3 * c + k, lo)


def _soft_sh_fwd_body(config: RenderConfig, tau: float, bh: int, bw: int,
                      cull: bool, max_cache: int, stats: bool,
                      *refs):
    """Shadowed forward: ONE fused geometry+shading sweep with a VMEM
    object cache, the shadow sweep, then a tiny clamp-correction loop.

    rgb_k = min(255, A_k + vis * B_k) couples every object's color to the
    light visibility at the *blended* hit point (softmin.py trace_soft
    semantics), and vis needs the blended depth - so the clamped blend
    cannot finish in the sweep that discovers the softmin weights. But the
    ambient part A_k and direct part B_k do NOT depend on vis, so sweep 1
    blends them online alongside the geometry softmin AND caches each
    culled-in object's shading state in scratch: A_k/B_k are scalar
    combinations of TWO ray planes (the Blinn-Phong dterm/sterm,
    shade_terms) and the object's color scalars, so a cache slot is only
    3 VMEM planes (t_eff, dterm, sterm) plus 3 SMEM color scalars -
    2.3x the slot capacity of caching (t_eff, A_rgb, B_rgb) directly
    (VERDICT r4 weak #3: slot crowding at 4K/200). After the shadow
    sweep fixes vis, the exact clamped blend is

        rgb = A_blend + vis * B_blend
              - sum_k w_k * max(0, A_k + vis B_k - 255)        (correction)
        d(rgb)/d(vis) = B_blend - sum_k w_k B_k [A_k + vis B_k >= 255]

    with the correction read straight from the cache (~45 VPU ops/slot
    instead of a ~250-op re-intersection per object). Only when a tile
    overflows the cache (count > max_cache: crowded scenes) does it fall
    back to the exact re-walk of the retired 3-sweep design.

    stats=True adds a per-tile diagnostic output (cnt_ref, int32 [1, 1]
    per grid cell): the number of culled-in objects = the cache demand,
    independent of max_cache - the honest measure of the clamp-fallback
    hit rate at any cache size (bench.py reports it at 1080p/20 and
    4K/200)."""
    if stats:
        (cam_ref, sph_ref, pl_ref, lst_ref, shlst_ref,
         out_ref, gate_ref, cnt_ref, cache_ref, ccol_ref) = refs
    else:
        (cam_ref, sph_ref, pl_ref, lst_ref, shlst_ref,
         out_ref, gate_ref, cache_ref, ccol_ref) = refs
    fns = _make_object_fns(config, tau)
    raygen = _make_raygen(config, bh, bw)
    i, j = pl.program_id(0), pl.program_id(1)

    ox, oy, oz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cam9 = tuple(cam_ref[0, idx] for idx in range(3, 12))
    row0 = cam_ref[0, C_ROW0]
    dx, dy, dz = raygen(i, j, row0, *cam9)

    inv_tau = jnp.float32(1.0 / tau)
    bg_logit = jnp.float32(-config.far / tau)
    n_sph = cam_ref[0, C_NSPH].astype(jnp.int32)
    n_pl = cam_ref[0, C_NPL].astype(jnp.int32)
    zero = jnp.zeros((bh, bw), jnp.float32)

    # ---- sweep 1: online softmin over t_eff; accumulate depth, normal,
    # and the vis-independent shading parts (A ambient, B direct); cache
    # per-object (t_eff, A, B) planes for the clamp correction.
    m = jnp.full((bh, bw), bg_logit, jnp.float32)
    s = jnp.ones((bh, bw), jnp.float32)
    acc = (jnp.full((bh, bw), jnp.float32(config.far)),) + (zero,) * 9
    count = jnp.zeros((), jnp.int32)

    def fused_accumulate(state, geo_out, col, sn):
        m, s, acc, count = state
        t_eff, t_clip, nx, ny, nz, hx, hy, hz = geo_out
        dterm, sterm = fns.shade_terms(hx, hy, hz, *sn, dx, dy, dz)
        (ar, br), (ag, bg_), (ab, bb) = fns.parts_from_terms(dterm, sterm,
                                                             *col)
        logit = -t_eff * inv_tau
        m_new = jnp.maximum(m, logit)
        e = jnp.exp(-jnp.abs(logit - m))
        up = logit > m
        alpha_ = jnp.where(up, e, 1.0)
        p = jnp.where(up, 1.0, e)
        s = s * alpha_ + p
        vals = (t_clip, nx, ny, nz, ar, ag, ab, br, bg_, bb)
        acc = tuple(a * alpha_ + p * vi for a, vi in zip(acc, vals))

        @pl.when(count < max_cache)
        def _store():
            # 3 planes (t_eff, dterm, sterm) + the color scalars in SMEM:
            # the correction loop rebuilds A/B from them with identical
            # expressions (parts_from_terms) - bit-exact vs caching A/B.
            cache_ref[count, 0] = t_eff
            cache_ref[count, 1] = dterm + zero
            cache_ref[count, 2] = sterm + zero
            ccol_ref[count, 0] = col[0]
            ccol_ref[count, 1] = col[1]
            ccol_ref[count, 2] = col[2]

        return m_new, s, acc, count + 1

    NS_ = sph_ref.shape[1]

    def sphere_geo_body(jj, state):
        k = lst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        col = (sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k])

        if not cull:
            gate_ref[0, 0, k] = 1
            g = fns.sphere_geo(*geo, dx, dy, dz, ox, oy, oz)
            return fused_accumulate(state, g, col, g[2:5])
        lb, t2, dss = fns.sphere_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

        def heavy(st):
            # bound's solve threaded through the cond: no re-solve
            g = fns.sphere_geo_post(geo[0], geo[1], geo[2], t2, dss,
                                    dx, dy, dz, ox, oy, oz)
            return fused_accumulate(st, g, col, g[2:5])

        rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
        gate_ref[0, 0, k] = rel.astype(jnp.int32)
        return jax.lax.cond(rel, heavy, lambda st: st, state)

    def plane_geo_body(k, state):
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        col = (pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k])

        if not cull:
            gate_ref[0, 0, NS_ + k] = 1
            g = fns.plane_geo(*geo, dx, dy, dz, ox, oy, oz)
            return fused_accumulate(state, g, col,
                                    fns.plane_unit_n(*geo[3:6]))
        lb, t, denom, pxp, pzp = fns.plane_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

        def heavy(st):
            g = fns.plane_geo_post(*geo, t, denom, pxp, pzp,
                                   dx, dy, dz, ox, oy, oz)
            return fused_accumulate(st, g, col,
                                    fns.plane_unit_n(*geo[3:6]))

        rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
        gate_ref[0, 0, NS_ + k] = rel.astype(jnp.int32)
        return jax.lax.cond(rel, heavy, lambda st: st, state)

    state = (m, s, acc, count)
    state = jax.lax.fori_loop(0, lst_ref[0, 0, 0], sphere_geo_body, state)
    m, s, acc, count = jax.lax.fori_loop(0, n_pl, plane_geo_body, state)
    if stats:
        cnt_ref[0, 0, 0] = count
    inv_s = 1.0 / s
    depth = acc[0] * inv_s

    # ---- shadow sweep at the blended hit point (shared helper: the
    # light-cone-listed occluder loops with the all-dark early-out).
    px_b = ox + dx * depth
    py_b = oy + dy * depth
    pz_b = oz + dz * depth
    lr = fns.light_ray(px_b, py_b, pz_b)

    def _sh_gate_store(idx, v):
        gate_ref[0, 1, idx] = v

    if stats:
        vis, sh_applied = _shadow_vis_sweep(fns, cull, bh, bw, sph_ref,
                                            pl_ref, shlst_ref, n_pl, lr,
                                            count_applied=True,
                                            gate_store=_sh_gate_store)
        cnt_ref[0, 0, 1] = sh_applied
    else:
        vis = _shadow_vis_sweep(fns, cull, bh, bw, sph_ref, pl_ref,
                                shlst_ref, n_pl, lr,
                                gate_store=_sh_gate_store)

    # ---- color blend: A/B accumulators + clamp correction from the cache
    # when it held every culled-in object; exact re-walk on overflow.
    rgb_dv = jax.lax.cond(
        count <= max_cache,
        lambda _: _clamp_blend_from_cache(fns, cache_ref, ccol_ref, count,
                                          m, inv_s, inv_tau, vis, acc, zero),
        lambda _: _clamp_blend_fallback(fns, cull, sph_ref, pl_ref, lst_ref,
                                        n_pl, m, inv_s, inv_tau, vis,
                                        dx, dy, dz, ox, oy, oz, zero),
        0)

    out_ref[SO_R] = rgb_dv[0]
    out_ref[SO_G] = rgb_dv[1]
    out_ref[SO_B] = rgb_dv[2]
    out_ref[SO_DEPTH] = depth
    out_ref[SO_NX] = acc[1] * inv_s
    out_ref[SO_NY] = acc[2] * inv_s
    out_ref[SO_NZ] = acc[3] * inv_s
    out_ref[SO_ALPHA] = 1.0 - jnp.exp(bg_logit - m) * inv_s
    out_ref[SO_M] = m
    out_ref[SO_S] = s
    out_ref[SO_VIS] = vis
    out_ref[SO_DVR] = rgb_dv[3]
    out_ref[SO_DVG] = rgb_dv[4]
    out_ref[SO_DVB] = rgb_dv[5]


def _soft_mse_fused_body(config: RenderConfig, tau: float, bh: int, bw: int,
                         cull: bool, max_cache: int, band_h: int | None,
                         *refs):
    """ONE-pass fused MSE train kernel: forward render, masked MSE loss,
    and the FULL backward - per tile, entirely register/VMEM-resident.

    For the rgb-MSE loss the output cotangents are computable the moment
    a tile's forward finishes (g_rgb = scale * (rgb - target); depth/
    normal/alpha cotangents are zero), so nothing forces the forward and
    backward into separate kernels with an HBM round-trip of the
    [n_out, H, W] plane stack between them. This kernel runs the
    shadowed (or plain) forward sweeps exactly as _soft_sh_fwd_body /
    _soft_fwd_body, computes the tile's loss contribution, derives the
    cotangents in registers, and immediately runs the backward sweeps of
    _soft_sh_bwd_body / _soft_bwd_body against the still-live state.
    Only the loss scalar and the tiny gradient tables leave the chip:
    HBM traffic drops from ~29 planes/step to the target read.

    Gradients are computed at loss-cotangent gbar = 1 and scaled by the
    caller's gbar in the custom_vjp bwd rule (they are exactly linear in
    it). Outputs: dsph [8,NS], dpl [12,NP], dcam [2,16] (Kahan rows),
    loss [2,1] (Kahan sum of per-tile raw sums of ((rgb-t)/255)^2; the
    wrapper divides by 3*H*W)."""
    if config.shadows:
        (cam_ref, sph_ref, pl_ref, lst_ref, shlst_ref, tgt_ref,
         dsph_ref, dpl_ref, dcam_ref, loss_ref, cache_ref, ccol_ref,
         gate_ref) = refs
    else:
        (cam_ref, sph_ref, pl_ref, lst_ref, tgt_ref,
         dsph_ref, dpl_ref, dcam_ref, loss_ref, gate_ref) = refs
    fns = _make_object_fns(config, tau)
    raygen = _make_raygen(config, bh, bw)
    i, j = pl.program_id(0), pl.program_id(1)
    NS = sph_ref.shape[1]
    NP = pl_ref.shape[1]

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _init():
        dsph_ref[...] = jnp.zeros(dsph_ref.shape, dsph_ref.dtype)
        dpl_ref[...] = jnp.zeros(dpl_ref.shape, dpl_ref.dtype)
        for idx in range(P.CAM_LEN):
            dcam_ref[0, idx] = 0.0
            dcam_ref[1, idx] = 0.0
        loss_ref[0, 0] = 0.0
        loss_ref[1, 0] = 0.0

    ox, oy, oz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cam9 = tuple(cam_ref[0, idx] for idx in range(3, 12))
    row0 = cam_ref[0, C_ROW0]
    dx, dy, dz, vxp, vyp, rinv = raygen.full(i, j, row0, *cam9)

    inv_tau = jnp.float32(1.0 / tau)
    bg_logit = jnp.float32(-config.far / tau)
    n_pl = cam_ref[0, C_NPL].astype(jnp.int32)
    zero = jnp.zeros((bh, bw), jnp.float32)
    sph_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NS), 1)
    pl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)

    # ================= forward =================
    if config.shadows:
        # Sweep 1 (geometry softmin + vis-independent shading parts +
        # 3-plane VMEM object cache), shadow sweep (shared helper with the
        # all-dark early-out), clamp correction - the exact
        # _soft_sh_fwd_body computation, landing in locals.
        m = jnp.full((bh, bw), bg_logit, jnp.float32)
        sN = jnp.ones((bh, bw), jnp.float32)
        acc = (jnp.full((bh, bw), jnp.float32(config.far)),) + (zero,) * 9
        count = jnp.zeros((), jnp.int32)

        def fused_accumulate(state, geo_out, col, sn):
            m, sN, acc, count = state
            t_eff, t_clip, nx, ny, nz, hx, hy, hz = geo_out
            dterm, sterm = fns.shade_terms(hx, hy, hz, *sn, dx, dy, dz)
            (ar, br), (ag, bg_), (ab, bb) = fns.parts_from_terms(
                dterm, sterm, *col)
            logit = -t_eff * inv_tau
            m_new = jnp.maximum(m, logit)
            e = jnp.exp(-jnp.abs(logit - m))
            up = logit > m
            alpha_ = jnp.where(up, e, 1.0)
            pw = jnp.where(up, 1.0, e)
            sN = sN * alpha_ + pw
            vals = (t_clip, nx, ny, nz, ar, ag, ab, br, bg_, bb)
            acc = tuple(a * alpha_ + pw * vi for a, vi in zip(acc, vals))

            @pl.when(count < max_cache)
            def _store():
                cache_ref[count, 0] = t_eff
                cache_ref[count, 1] = dterm + zero
                cache_ref[count, 2] = sterm + zero
                ccol_ref[count, 0] = col[0]
                ccol_ref[count, 1] = col[1]
                ccol_ref[count, 2] = col[2]

            return m_new, sN, acc, count + 1

        def sphere_geo_body(jj, state):
            k = lst_ref[0, 0, 1 + jj]
            geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
                   sph_ref[P.S_R, k])
            col = (sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k])

            if not cull:
                g = fns.sphere_geo(*geo, dx, dy, dz, ox, oy, oz)
                return fused_accumulate(state, g, col, g[2:5])
            lb, t2, dss = fns.sphere_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

            def heavy(st):
                # bound's solve threaded through the cond: no re-solve
                g = fns.sphere_geo_post(geo[0], geo[1], geo[2], t2, dss,
                                        dx, dy, dz, ox, oy, oz)
                return fused_accumulate(st, g, col, g[2:5])

            rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
            # record the gate for the same-kernel backward (running-max
            # decision: a SUPERSET of the exact final-max gate - safe)
            gate_ref[0, k] = rel.astype(jnp.int32)
            return jax.lax.cond(rel, heavy, lambda st: st, state)

        def plane_geo_body(k, state):
            geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
                   pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
                   pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
            col = (pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k])

            if not cull:
                g = fns.plane_geo(*geo, dx, dy, dz, ox, oy, oz)
                return fused_accumulate(state, g, col,
                                        fns.plane_unit_n(*geo[3:6]))
            lb, t, denom, pxp, pzp = fns.plane_lb_ex(*geo, dx, dy, dz,
                                                     ox, oy, oz)

            def heavy(st):
                g = fns.plane_geo_post(*geo, t, denom, pxp, pzp,
                                       dx, dy, dz, ox, oy, oz)
                return fused_accumulate(st, g, col,
                                        fns.plane_unit_n(*geo[3:6]))

            rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
            gate_ref[0, NS + k] = rel.astype(jnp.int32)
            return jax.lax.cond(rel, heavy, lambda st: st, state)

        state = (m, sN, acc, count)
        state = jax.lax.fori_loop(0, lst_ref[0, 0, 0], sphere_geo_body, state)
        m, sN, acc, count = jax.lax.fori_loop(0, n_pl, plane_geo_body, state)
        inv_s = 1.0 / sN
        depth = acc[0] * inv_s

        px_b = ox + dx * depth
        py_b = oy + dy * depth
        pz_b = oz + dz * depth
        lr = fns.light_ray(px_b, py_b, pz_b)

        def _sh_gate_store(idx, v):
            gate_ref[1, idx] = v

        vis = _shadow_vis_sweep(fns, cull, bh, bw, sph_ref, pl_ref,
                                shlst_ref, n_pl, lr,
                                gate_store=_sh_gate_store)

        rgb_dv = jax.lax.cond(
            count <= max_cache,
            lambda _: _clamp_blend_from_cache(fns, cache_ref, ccol_ref,
                                              count, m, inv_s, inv_tau, vis,
                                              acc, zero),
            lambda _: _clamp_blend_fallback(fns, cull, sph_ref, pl_ref,
                                            lst_ref, n_pl, m, inv_s, inv_tau,
                                            vis, dx, dy, dz, ox, oy, oz,
                                            zero),
            0)
        out_rgb = rgb_dv[:3]
        dv = rgb_dv[3:]
        out_depth = depth
    else:
        # Plain softmin forward (_soft_fwd_body) - only the rgb blend and
        # the softmax statistics matter for the MSE cotangents.
        sphere_f, plane_f = fns.sphere_f, fns.plane_f
        m = jnp.full((bh, bw), bg_logit, jnp.float32)
        sN = jnp.ones((bh, bw), jnp.float32)
        acc = (zero,) * 3

        def accumulate(state, values):
            m, sN, acc = state
            t_eff, r_, g_, b_ = values[0], values[1], values[2], values[3]
            logit = -t_eff * inv_tau
            m_new = jnp.maximum(m, logit)
            e = jnp.exp(-jnp.abs(logit - m))
            up = logit > m
            alpha_ = jnp.where(up, e, 1.0)
            pw = jnp.where(up, 1.0, e)
            sN = sN * alpha_ + pw
            acc = tuple(a * alpha_ + pw * vi
                        for a, vi in zip(acc, (r_, g_, b_)))
            return m_new, sN, acc

        def sphere_body_f(jj, state):
            k = lst_ref[0, 0, 1 + jj]
            geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
                   sph_ref[P.S_R, k])
            col = (sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k],
                   sph_ref[P.S_COLB, k])

            if not cull:
                return accumulate(state, sphere_f(*geo, *col, dx, dy, dz,
                                                  ox, oy, oz))
            lb, t2, dss = fns.sphere_lb_ex(*geo, dx, dy, dz, ox, oy, oz)

            def heavy(st):
                vals = fns.sphere_f_post(geo[0], geo[1], geo[2], t2, dss,
                                         *col, dx, dy, dz, ox, oy, oz)
                return accumulate(st, vals)

            rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
            gate_ref[0, k] = rel.astype(jnp.int32)
            return jax.lax.cond(rel, heavy, lambda st: st, state)

        def plane_body_f(k, state):
            geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
                   pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
                   pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
            col = (pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k],
                   pl_ref[P.P_COLB, k])

            if not cull:
                return accumulate(state, plane_f(*geo, *col, dx, dy, dz,
                                                 ox, oy, oz))
            lb, t, denom, pxp, pzp = fns.plane_lb_ex(*geo, dx, dy, dz,
                                                     ox, oy, oz)

            def heavy(st):
                vals = fns.plane_f_post(*geo, t, denom, pxp, pzp, *col,
                                        dx, dy, dz, ox, oy, oz)
                return accumulate(st, vals)

            rel = jnp.max(-lb * inv_tau - state[0]) > _CULL_LOG_EPS
            gate_ref[0, NS + k] = rel.astype(jnp.int32)
            return jax.lax.cond(rel, heavy, lambda st: st, state)

        state = (m, sN, acc)
        state = jax.lax.fori_loop(0, lst_ref[0, 0, 0], sphere_body_f, state)
        m, sN, acc = jax.lax.fori_loop(0, n_pl, plane_body_f, state)
        inv_s = 1.0 / sN
        out_rgb = tuple(a * inv_s for a in acc)
        out_depth = None  # g_depth = 0 and S has no depth term

    # ================= loss + cotangents (gbar = 1) =================
    H = band_h if band_h is not None else config.height
    W = config.width
    rows = i * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    cols = j * bw + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    mask = ((rows < H) & (cols < W)).astype(jnp.float32)
    diff = tuple((out_rgb[c] - tgt_ref[c]) * mask for c in range(3))
    tile_loss = (jnp.sum(diff[0] * diff[0]) + jnp.sum(diff[1] * diff[1])
                 + jnp.sum(diff[2] * diff[2])) * jnp.float32(1.0 / 255.0 ** 2)
    _kahan_add(loss_ref, 0, tile_loss)
    scale = jnp.float32(2.0 / (255.0 * 255.0 * 3.0 * H * W))
    g_rgb = tuple(scale * d for d in diff)

    # ================= backward =================
    if config.shadows:
        g_vis = g_rgb[0] * dv[0] + g_rgb[1] * dv[1] + g_rgb[2] * dv[2]
        rel_floor = -16.0 / fns.shadow_ks

        def sh_sphere_body(jj, carry):
            k = shlst_ref[0, 0, 1 + jj]
            geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
                   sph_ref[P.S_R, k])
            # gate recorded by the forward's shadow sweep (identical
            # predicate): no per-occluder pre solve in the backward
            rel = gate_ref[1, k] == 1

            def heavy(c):
                ctx, cty, ctz, dsph, dpl = c
                f_j, fvjp = jax.vjp(fns.shadow_sphere_f, *geo, px_b, py_b, pz_b)
                grads = fvjp(g_vis * vis / f_j)
                onehot = (sph_iota == k).astype(jnp.float32)
                dsph = tuple(
                    (a + onehot * grads[row]) if row < 4 else a
                    for row, a in enumerate(dsph)
                )
                return (ctx + grads[4], cty + grads[5], ctz + grads[6],
                        dsph, dpl)

            if not cull:
                return heavy(carry)
            return jax.lax.cond(rel, heavy, lambda c: c, carry)

        def sh_plane_body(k, carry):
            geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
                   pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
                   pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
            rel = gate_ref[1, NS + k] == 1

            def heavy(c):
                ctx, cty, ctz, dsph, dpl = c
                f_j, fvjp = jax.vjp(fns.shadow_plane_f, *geo, px_b, py_b, pz_b)
                grads = fvjp(g_vis * vis / f_j)
                onehot = (pl_iota == k).astype(jnp.float32)
                dpl = tuple(
                    (a + onehot * grads[row]) if row < 8 else a
                    for row, a in enumerate(dpl)
                )
                return (ctx + grads[8], cty + grads[9], ctz + grads[10],
                        dsph, dpl)

            if not cull:
                return heavy(carry)
            return jax.lax.cond(rel, heavy, lambda c: c, carry)

        sh_carry = (zero, zero, zero,
                    tuple(jnp.zeros((1, NS), jnp.float32) for _ in range(P.SPH_ROWS)),
                    tuple(jnp.zeros((1, NP), jnp.float32) for _ in range(P.PL_ROWS)))
        sh_carry = jax.lax.fori_loop(0, shlst_ref[0, 0, 0], sh_sphere_body,
                                     sh_carry)
        ct_px, ct_py, ct_pz, dsph0, dpl0 = jax.lax.fori_loop(
            0, n_pl, sh_plane_body, sh_carry)

        ct_d = ct_px * dx + ct_py * dy + ct_pz * dz
        g_depth = ct_d
        S = (g_rgb[0] * out_rgb[0] + g_rgb[1] * out_rgb[1]
             + g_rgb[2] * out_rgb[2] + g_depth * out_depth)
        vis_kw = {"vis": vis}
        seed = (ct_px * out_depth, ct_py * out_depth, ct_pz * out_depth,
                jnp.sum(ct_px), jnp.sum(ct_py), jnp.sum(ct_pz),
                dsph0, dpl0)
    else:
        g_depth = zero
        S = (g_rgb[0] * out_rgb[0] + g_rgb[1] * out_rgb[1]
             + g_rgb[2] * out_rgb[2])
        vis_kw = {}
        seed = (zero, zero, zero,
                jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                tuple(jnp.zeros((1, NS), jnp.float32) for _ in range(P.SPH_ROWS)),
                tuple(jnp.zeros((1, NP), jnp.float32) for _ in range(P.PL_ROWS)))

    def cotangents(vals):
        t_eff, r_, g_, b_, t_clip, nx, ny, nz = vals
        w = jnp.exp(-t_eff * inv_tau - m) * inv_s
        gdotv = (g_rgb[0] * r_ + g_rgb[1] * g_ + g_rgb[2] * b_
                 + g_depth * t_clip)
        dlogit = w * (gdotv - S)
        ct_teff = -dlogit * inv_tau
        # Normal/alpha cotangents are zero for the rgb MSE; the zero
        # plane (a compile-time constant) const-folds out of the vjp.
        return (ct_teff, w * g_rgb[0], w * g_rgb[1], w * g_rgb[2],
                w * g_depth, zero, zero, zero)

    def sphere_body(jj, carry):
        k = lst_ref[0, 0, 1 + jj]
        geo = (sph_ref[P.S_CX, k], sph_ref[P.S_CY, k], sph_ref[P.S_CZ, k],
               sph_ref[P.S_R, k])
        # forward-recorded gate (running-max decision: superset of the
        # exact final-max gate; extras carry sub-floor weights whose
        # cotangents vanish) - no lb re-solve in the backward
        rel = gate_ref[0, k] == 1

        def heavy(c):
            gdx, gdy, gdz, gox, goy, goz, dsph, dpl = c
            args = (*geo,
                    sph_ref[P.S_COLR, k], sph_ref[P.S_COLG, k], sph_ref[P.S_COLB, k],
                    dx, dy, dz, ox, oy, oz)
            vals, fvjp = jax.vjp(
                lambda *a: fns.sphere_f(*a, **vis_kw), *args)
            grads = fvjp(cotangents(vals))
            onehot = (sph_iota == k).astype(jnp.float32)
            dsph = tuple(
                (a + onehot * grads[row]) if row < 7 else a
                for row, a in enumerate(dsph)
            )
            return (gdx + grads[7], gdy + grads[8], gdz + grads[9],
                    gox + grads[10], goy + grads[11], goz + grads[12],
                    dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    def plane_body(k, carry):
        geo = (pl_ref[P.P_CX, k], pl_ref[P.P_CY, k], pl_ref[P.P_CZ, k],
               pl_ref[P.P_NX, k], pl_ref[P.P_NY, k], pl_ref[P.P_NZ, k],
               pl_ref[P.P_HW, k], pl_ref[P.P_HH, k])
        rel = gate_ref[0, NS + k] == 1

        def heavy(c):
            gdx, gdy, gdz, gox, goy, goz, dsph, dpl = c
            args = (*geo,
                    pl_ref[P.P_COLR, k], pl_ref[P.P_COLG, k], pl_ref[P.P_COLB, k],
                    dx, dy, dz, ox, oy, oz)
            vals, fvjp = jax.vjp(
                lambda *a: fns.plane_f(*a, **vis_kw), *args)
            grads = fvjp(cotangents(vals))
            onehot = (pl_iota == k).astype(jnp.float32)
            dpl = tuple(
                (a + onehot * grads[row]) if row < 11 else a
                for row, a in enumerate(dpl)
            )
            return (gdx + grads[11], gdy + grads[12], gdz + grads[13],
                    gox + grads[14], goy + grads[15], goz + grads[16],
                    dsph, dpl)

        if not cull:
            return heavy(carry)
        return jax.lax.cond(rel, heavy, lambda c: c, carry)

    carry = jax.lax.fori_loop(0, lst_ref[0, 0, 0], sphere_body, seed)
    carry = jax.lax.fori_loop(0, n_pl, plane_body, carry)
    gdx, gdy, gdz, gox, goy, goz, dsph_rows, dpl_rows = carry

    dsph_ref[...] += jnp.concatenate(dsph_rows, axis=0)
    dpl_ref[...] += jnp.concatenate(dpl_rows, axis=0)

    sd = gdx * dx + gdy * dy + gdz * dz
    gps = (rinv * (gdx - dx * sd),
           rinv * (gdy - dy * sd),
           rinv * (gdz - dz * sd))
    for idx, gval in enumerate((gox, goy, goz)):
        _kahan_add(dcam_ref, idx, gval)
    for c, gp in enumerate(gps):
        for k, wplane in enumerate((vxp, vyp, None)):
            hi, lo = _twofloat_plane_sum(gp if wplane is None else gp * wplane)
            _kahan_add(dcam_ref, 3 + 3 * c + k, hi)
            _kahan_add(dcam_ref, 3 + 3 * c + k, lo)


@functools.lru_cache(maxsize=32)
def _build_soft_packed(config: RenderConfig, tau: float, bh: int, bw: int,
                       interpret: bool, band_h: int | None = None,
                       fwd_cull: bool = True, bwd_cull: bool = True,
                       mse: bool = False):
    """custom_vjp'd fn(sph [8,NS], pl [12,NP], cam [1,16]) -> [10,Hp,Wp].

    band_h renders only that many image rows starting at the row carried in
    cam[0, C_ROW0] (NDC math still uses the full config resolution) - the
    tile-sharding hook used by dist/mesh.py.

    fwd_cull / bwd_cull disable the two-level culling (broad-phase work
    lists AND the in-kernel bound gates) in the respective kernel - the
    honest no-culling baselines for the benchmark decomposition and the
    roofline's no-credit speed-of-light checks. Production paths keep
    both True.

    mse=True returns the FUSED-LOSS train path instead:
    fn(sph, pl_, cam, tgt [3,Hp,Wp]) -> scalar mean(((rgb-tgt)/255)^2)
    over the valid pixels, evaluated by the ONE-PASS kernel
    (_soft_mse_fused_body): forward render, loss, and the full backward
    per tile with everything register/VMEM-resident - only the loss
    scalar and the tiny gradient tables touch HBM. The custom_vjp's
    forward rule runs that kernel at loss-cotangent 1 and the backward
    rule scales the saved tables by the caller's gbar (gradients are
    exactly linear in it); a plain un-differentiated call takes the
    ordinary forward kernel + jnp loss instead (no gradient work)."""
    Hp = _round_up(band_h if band_h is not None else config.height, bh)
    Wp = _round_up(config.width, bw)
    grid = (Hp // bh, Wp // bw)
    # config.shadows selects the shadowed kernel pair and widens the saved
    # statistics from 10 to 14 planes (vis + d(rgb)/d(vis)).
    n_out = N_PLANES_SH if config.shadows else N_PLANES
    bwd_body = _soft_sh_bwd_body if config.shadows else _soft_bwd_body

    if config.shadows:
        # VMEM object cache for the shadowed forward's clamp correction:
        # 3 planes (t_eff, dterm, sterm) per slot + the color scalars in
        # SMEM, ~7 MB budget out of the ~16 MB scoped VMEM (the out block
        # + carried accumulators take the rest). The 3-plane layout (the
        # per-channel A/B parts are scalar combinations of dterm/sterm,
        # shade_terms) fits 2.3x the slots of the retired 7-plane one -
        # the r4 crowding fix for 200-object frusta. Tiles with more
        # culled-in objects than slots fall back to the exact re-walk
        # inside the kernel.
        max_cache = max(2, min(_CACHE_SLOT_CAP, (7 * 2**20) // (3 * bh * bw * 4)))
        fwd_kernel = functools.partial(_soft_sh_fwd_body, config, tau, bh,
                                       bw, fwd_cull, max_cache, False)
        fwd_scratch = [pltpu.VMEM((max_cache, 3, bh, bw), jnp.float32),
                       pltpu.SMEM((max_cache, 3), jnp.float32)]
    else:
        fwd_kernel = functools.partial(_soft_fwd_body, config, tau, bh, bw,
                                       fwd_cull)
        fwd_scratch = []

    # The broad-phase work-list tables ride in SMEM one tile-row at a time
    # (block (1, NS+1) selected by the grid position). When shadows are on
    # a second table carries the tile's shadow-occluder list.
    Tj = grid[1]

    def _list_spec(lists):
        return pl.BlockSpec((1, 1, lists.shape[2]),
                            lambda i, j: (i * Tj + j, 0, 0),
                            memory_space=pltpu.SMEM)

    def _gate_spec(n_objs):
        return pl.BlockSpec((1, 2, n_objs),
                            lambda i, j: (i * Tj + j, 0, 0),
                            memory_space=pltpu.SMEM)

    def fwd_call(sph, pl_, cam):
        # fwd_cull=False disables the broad phase too (every active sphere
        # listed): the honest no-culling benchmark baseline.
        # Returns (planes, gates): gates is the per-tile record of the
        # in-kernel relevance decisions ([T, 2, NS+NP] int32; row 0 main
        # sweep, row 1 shadow sweep), consumed by the backward kernel so
        # it never re-solves the gating bounds (r5).
        lists, shl = _build_tile_lists(sph, pl_, cam, config, tau, bh, bw,
                                       grid, config.shadows,
                                       disable=not fwd_cull)
        ins = [cam, sph, pl_, lists]
        if config.shadows:
            ins.append(shl)
        n_objs = sph.shape[1] + pl_.shape[1]
        T = grid[0] * grid[1]
        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [_list_spec(t) for t in ins[3:]],
            out_specs=[
                pl.BlockSpec((n_out, bh, bw), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                _gate_spec(n_objs),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_out, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((T, 2, n_objs), jnp.int32),
            ],
            scratch_shapes=fwd_scratch,
            interpret=interpret,
        )(*ins)

    def bwd_call(sph, pl_, cam, sav, gates, g):
        kernel = functools.partial(bwd_body, config, tau, bh, bw, bwd_cull)
        # Backward culling reuses the forward's recorded gates (running-
        # max decisions: a superset of the exact final-max gate, so
        # conservative); bwd_cull=False exists only for the no-credit SOL
        # measurement.
        lists, shl = _build_tile_lists(sph, pl_, cam, config, tau, bh, bw,
                                       grid, config.shadows,
                                       disable=not bwd_cull)
        ins = [cam, sph, pl_, lists]
        if config.shadows:
            ins.append(shl)
        n_lists = len(ins) - 3
        ins += [gates, sav, g]
        tail_specs = [
            _gate_spec(gates.shape[2]),
            pl.BlockSpec((n_out, bh, bw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, bh, bw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [_list_spec(t) for t in ins[3:3 + n_lists]] + tail_specs,
            out_specs=[
                # grad tables in VMEM (vector read-modify-write per tile);
                # camera grads in SMEM (scalar stores only).
                pl.BlockSpec(sph.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(pl_.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, P.CAM_LEN), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(sph.shape, jnp.float32),
                jax.ShapeDtypeStruct(pl_.shape, jnp.float32),
                jax.ShapeDtypeStruct((2, P.CAM_LEN), jnp.float32),
            ],
            interpret=interpret,
        )(*ins)

    if mse:
        Hv = band_h if band_h is not None else config.height
        Wv = config.width
        # The one-pass kernel carries the forward sweep state AND the
        # backward carries simultaneously; trim the object-cache VMEM
        # budget to leave room (~5 MB cache + live planes at (128, 128)
        # tiles; 3 planes/slot, see the max_cache comment above).
        fused_cache = max(2, min(_CACHE_SLOT_CAP, (5 * 2**20) // (3 * bh * bw * 4)))
        # One cull switch for the one-pass kernel: the production path
        # has both on; the no-credit SOL measurement turns both off.
        fused_cull = fwd_cull and bwd_cull

        def fused_call(sph, pl_, cam, tgt):
            kernel = functools.partial(_soft_mse_fused_body, config, tau,
                                       bh, bw, fused_cull, fused_cache,
                                       band_h)
            lists, shl = _build_tile_lists(sph, pl_, cam, config, tau, bh,
                                           bw, grid, config.shadows,
                                           disable=not fused_cull)
            ins = [cam, sph, pl_, lists]
            if config.shadows:
                ins.append(shl)
            n_lists = len(ins) - 3
            ins.append(tgt)
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ] + [_list_spec(t) for t in ins[3:3 + n_lists]] + [
                    pl.BlockSpec((3, bh, bw), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec(sph.shape, lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(pl_.shape, lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, P.CAM_LEN), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((2, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(sph.shape, jnp.float32),
                    jax.ShapeDtypeStruct(pl_.shape, jnp.float32),
                    jax.ShapeDtypeStruct((2, P.CAM_LEN), jnp.float32),
                    jax.ShapeDtypeStruct((2, 1), jnp.float32),
                ],
                scratch_shapes=(
                    [pltpu.VMEM((fused_cache, 3, bh, bw), jnp.float32),
                     pltpu.SMEM((fused_cache, 3), jnp.float32)]
                    if config.shadows else []) + [
                    # forward-recorded culling gates, reused by the
                    # same-kernel backward (rows: 0 = main sweep,
                    # 1 = shadow sweep; cols: spheres then planes)
                    pltpu.SMEM((2, sph.shape[1] + pl_.shape[1]),
                               jnp.int32)],
                interpret=interpret,
            )(*ins)

        inv_n = 1.0 / (3.0 * Hv * Wv)

        def loss_of_out(out, tgt):
            rgb = out[SO_R:SO_B + 1, :Hv, :Wv]
            return jnp.mean(((rgb - tgt[:, :Hv, :Wv]) / 255.0) ** 2)

        @jax.custom_vjp
        def soft_mse(sph, pl_, cam, tgt):
            # Un-differentiated call: ordinary forward + jnp loss, no
            # gradient work (the fused kernel only runs under jax.grad).
            return loss_of_out(fwd_call(sph, pl_, cam)[0], tgt)

        def mse_fwd(sph, pl_, cam, tgt):
            dsph1, dpl1, dcam2, loss2 = fused_call(sph, pl_, cam, tgt)
            loss = (loss2[0, 0] + loss2[1, 0]) * inv_n
            return loss, (dsph1, dpl1, dcam2, sph, pl_, cam, tgt)

        def mse_bwd(res, gbar):
            dsph1, dpl1, dcam2, sph, pl_, cam, tgt = res
            # Gradients are linear in the loss cotangent: scale the
            # gbar=1 tables the one-pass kernel saved.
            g = jnp.asarray(gbar, jnp.float32)
            dsph = g * dsph1
            dpl = g * dpl1
            dcam = (g * (dcam2[0] + dcam2[1]))[None, :]
            # Target cotangent, for completeness: needs the rgb planes the
            # fused kernel never materializes - recompute them with the
            # ordinary forward. XLA dead-code-eliminates this whole branch
            # (including the pallas_call) when, as in every train loop,
            # the target is not differentiated.
            sav = fwd_call(sph, pl_, cam)[0]
            gt = -g * 2.0 * inv_n / (255.0 * 255.0) * (
                sav[SO_R:SO_B + 1, :Hv, :Wv] - tgt[:, :Hv, :Wv])
            dtgt = jnp.zeros_like(tgt).at[:, :Hv, :Wv].set(gt)
            return dsph, dpl, dcam, dtgt

        soft_mse.defvjp(mse_fwd, mse_bwd)
        return soft_mse, (Hp, Wp)

    @jax.custom_vjp
    def soft_packed(sph, pl_, cam):
        return fwd_call(sph, pl_, cam)[0]

    def soft_fwd(sph, pl_, cam):
        out, gates = fwd_call(sph, pl_, cam)
        return out, (sph, pl_, cam, out, gates)

    def soft_bwd(res, g):
        sph, pl_, cam, sav, gates = res
        # Cotangents on the m/s statistic planes are discarded: the
        # closed-form softmax VJP already accounts for the normalizer.
        dsph, dpl, dcam2 = bwd_call(sph, pl_, cam, sav, gates, g)
        # Row 0 = Kahan sum, row 1 = residual compensation; their sum is
        # the best f32 estimate of the cross-tile total.
        dcam = (dcam2[0] + dcam2[1])[None, :]
        return dsph, dpl, dcam

    soft_packed.defvjp(soft_fwd, soft_bwd)
    return soft_packed, (Hp, Wp)


_BH_CANDIDATES = (96, 128, 160, 192)
_BW_SOFT_CANDIDATES = (128, 256)


def _pick_tiles(config: RenderConfig, bh: int | None, bw: int | None,
                band_h: int | None = None):
    # Tall NARROW tiles win for the soft kernels (measured r4, v5e,
    # benchmarks/tune_soft.py): a ~square 128x128-pixel image patch
    # subtends the smallest cone per ray, so the broad-phase work lists
    # (_sphere_tile_lists / _shadow_tile_lists) are maximally selective -
    # (128,128) beats the old (32,640) default 1.7x at 1080p/20 and 2.5x
    # at 4K/200 on the shadowed fused train step. Among the candidate
    # sizes, pick the one minimizing padded waste (prefer smaller on
    # ties): 1080p -> (160,128), 4K -> (128,128), both measured best.
    H = band_h if band_h is not None else config.height
    if bh is None:
        bh = min(_BH_CANDIDATES, key=lambda c: (_round_up(H, c) - H, c))
    if bw is None:
        bw = min(_BW_SOFT_CANDIDATES,
                 key=lambda c: (_round_up(config.width, c) - config.width, c))
    else:
        # Round user-supplied widths to the vreg lane multiple: the
        # in-kernel compensated reductions (_twofloat_plane_sum) require
        # (8k, 128k) tiles.
        bw = min(_round_up(bw, 128), _round_up(config.width, 128))
    if config.shadows:
        # the shadowed kernels carry the object cache + ~30 live planes;
        # bw = 256 tiles exceed the ~16 MB scoped VMEM (measured compile
        # OOM at (160, 256) and (128, 256)); every measured-best shape
        # is bw = 128 anyway (benchmarks/tune_soft.py)
        bw = min(bw, 128)
    bh = min(_round_up(bh, 8), _round_up(H, 8))
    return bh, bw


def soft_band_packed(sph, pl_, cam, row0, *, config: RenderConfig, tau: float,
                     band_h: int, bh: int | None = None, bw: int | None = None,
                     interpret: bool | None = None):
    """Render a band of `band_h` image rows starting at traced row `row0`
    on the fused fwd+bwd kernels, from pre-packed tables (pack.py layout;
    cam must already carry the counts in C_NSPH/C_NPL). Returns the
    [10, band_h, W] plane stack (SO_* indices). Used by the tile-sharded
    train step (dist/mesh.py); differentiable in sph/pl_/cam."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, bw = _pick_tiles(config, bh, bw, band_h)
    cam = cam.at[0, C_ROW0].set(jnp.asarray(row0, jnp.float32))
    fn, _ = _build_soft_packed(config, float(tau), bh, bw, interpret, band_h)
    return fn(sph, pl_, cam)[:, :band_h, : config.width]


def soft_band_mse_loss(sph, pl_, cam, row0, tgt_band, *,
                       config: RenderConfig, tau: float, band_h: int,
                       bh: int | None = None, bw: int | None = None,
                       interpret: bool | None = None):
    """Fused-MSE loss of a band of `band_h` image rows starting at traced
    row `row0`, from pre-packed tables (soft_band_packed's contract):
    mean(((rgb - tgt_band)/255)^2) over the band, with the cotangents
    derived inside the backward kernel. tgt_band is [band_h, W, 3]. Used
    by the tile-sharded train step (dist/mesh.py): per-band means pmean
    to the global mean."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, bw = _pick_tiles(config, bh, bw, band_h)
    cam = cam.at[0, C_ROW0].set(jnp.asarray(row0, jnp.float32))
    fn, (Hp, Wp) = _build_soft_packed(config, float(tau), bh, bw, interpret,
                                      band_h, mse=True)
    tgt = jnp.moveaxis(tgt_band.astype(jnp.float32), -1, 0)
    tgt = jnp.pad(tgt, ((0, 0), (0, Hp - band_h), (0, Wp - config.width)))
    return fn(sph, pl_, cam, tgt)


@functools.partial(jax.jit, static_argnames=("config", "tau", "bh", "bw",
                                             "interpret", "cull", "bwd_cull"))
def _soft_mse_pallas_jit(scene, camera, target, *, config, tau, bh, bw,
                         interpret, cull=True, bwd_cull=True):
    sph, pl_, counts = P.pack_scene(scene)
    cam = P.pack_camera(camera)
    cam = cam.at[0, C_NSPH].set(counts[0].astype(jnp.float32))
    cam = cam.at[0, C_NPL].set(counts[1].astype(jnp.float32))
    fn, (Hp, Wp) = _build_soft_packed(config, tau, bh, bw, interpret,
                                      fwd_cull=cull, bwd_cull=bwd_cull,
                                      mse=True)
    tgt = jnp.moveaxis(target.astype(jnp.float32), -1, 0)
    tgt = jnp.pad(tgt, ((0, 0), (0, Hp - config.height),
                        (0, Wp - config.width)))
    return fn(sph, pl_, cam, tgt)


def render_soft_mse_loss(scene, camera, target, config: RenderConfig,
                         tau: float | None = None, bh: int | None = None,
                         bw: int | None = None, interpret: bool | None = None,
                         cull: bool = True, bwd_cull: bool = True):
    """Fused-loss training step primitive: mean(((rgb - target)/255)^2)
    of the soft render, differentiable in scene and camera, with the MSE
    cotangents derived INSIDE the backward kernel (_mse_cotangents) so
    the full [n_out, H, W] cotangent stack never exists in HBM. Same
    gradients as jnp.mean(((render_frame_soft_pallas(...).rgb -
    target)/255.0)**2) (tests pin the parity); target is [H, W, 3].

    This is the production train-loop path (bench.py headline); use the
    general render_frame_soft_pallas for arbitrary losses."""
    tau = config.soft_tau if tau is None else tau
    if tau <= 0.0:
        raise ValueError("render_soft_mse_loss needs tau > 0")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, bw = _pick_tiles(config, bh, bw)
    return _soft_mse_pallas_jit(
        scene, camera, target, config=config, tau=float(tau), bh=bh, bw=bw,
        interpret=interpret, cull=cull, bwd_cull=bwd_cull,
    )


@functools.partial(jax.jit, static_argnames=("config", "tau", "bh", "bw",
                                             "interpret", "cull", "bwd_cull"))
def _render_soft_pallas_jit(scene, camera, *, config, tau, bh, bw, interpret,
                            cull=True, bwd_cull=True):
    sph, pl_, counts = P.pack_scene(scene)
    cam = P.pack_camera(camera)
    cam = cam.at[0, C_NSPH].set(counts[0].astype(jnp.float32))
    cam = cam.at[0, C_NPL].set(counts[1].astype(jnp.float32))
    fn, (Hp, Wp) = _build_soft_packed(config, tau, bh, bw, interpret,
                                      fwd_cull=cull, bwd_cull=bwd_cull)
    out = fn(sph, pl_, cam)[:, : config.height, : config.width]
    rgb = jnp.moveaxis(out[SO_R: SO_B + 1], 0, -1)
    normal = jnp.moveaxis(out[SO_NX: SO_NZ + 1], 0, -1)
    depth = out[SO_DEPTH]
    hit = depth <= config.far * (1.0 - 1e-4)
    return Framebuffer(
        rgb=rgb, normal=normal, depth=depth,
        shading=normal[..., 0],
        hit=hit,
        coverage=hit.astype(jnp.float32),
        alpha=out[SO_ALPHA],
    )


def render_frame_soft_pallas(
    scene,
    camera: Camera,
    config: RenderConfig,
    tau: float | None = None,
    bh: int | None = None,
    bw: int | None = None,
    interpret: bool | None = None,
    cull: bool = True,
    bwd_cull: bool = True,
) -> Framebuffer:
    """Differentiable frame render on the fused Pallas fwd+bwd kernels.

    Drop-in for render_frame_soft (minus straight_through); gradients flow
    to scene geometry/colors and camera pose through pack_scene/pack_camera.
    cull=False / bwd_cull=False disable the two-level per-tile object
    culling in the forward / backward kernel (benchmark decomposition and
    the roofline's no-credit speed-of-light checks).
    """
    tau = config.soft_tau if tau is None else tau
    if tau <= 0.0:
        raise ValueError("render_frame_soft_pallas needs tau > 0")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, bw = _pick_tiles(config, bh, bw)
    return _render_soft_pallas_jit(
        scene, camera, config=config, tau=float(tau), bh=bh, bw=bw,
        interpret=interpret, cull=cull, bwd_cull=bwd_cull,
    )


@functools.lru_cache(maxsize=8)
def _build_cache_stats(config: RenderConfig, tau: float, bh: int, bw: int,
                       interpret: bool):
    """Stats variant of the shadowed forward: per-tile culled-in object
    counts (= clamp-correction cache demand, independent of the cache
    size) as an extra SMEM output. Diagnostic only (bench.py's
    cache-fallback instrumentation, VERDICT r4 weak #3)."""
    assert config.shadows, "cache stats exist only for the shadowed forward"
    Hp = _round_up(config.height, bh)
    Wp = _round_up(config.width, bw)
    grid = (Hp // bh, Wp // bw)
    max_cache = max(2, min(_CACHE_SLOT_CAP, (7 * 2**20) // (3 * bh * bw * 4)))
    kernel = functools.partial(_soft_sh_fwd_body, config, tau, bh, bw,
                               True, max_cache, True)
    Tj = grid[1]

    def _list_spec(lists):
        return pl.BlockSpec((1, 1, lists.shape[2]),
                            lambda i, j: (i * Tj + j, 0, 0),
                            memory_space=pltpu.SMEM)

    @jax.jit
    def call(sph, pl_, cam):
        lists, shl = _build_tile_lists(sph, pl_, cam, config, tau, bh, bw,
                                       grid, True)
        n_objs = sph.shape[1] + pl_.shape[1]
        T = grid[0] * grid[1]
        _, _, counts = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
                     + [_list_spec(lists), _list_spec(shl)],
            out_specs=[
                pl.BlockSpec((N_PLANES_SH, bh, bw), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, n_objs), lambda i, j: (i * Tj + j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 2), lambda i, j: (i * Tj + j, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N_PLANES_SH, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((T, 2, n_objs), jnp.int32),
                jax.ShapeDtypeStruct((T, 1, 2), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((max_cache, 3, bh, bw), jnp.float32),
                            pltpu.SMEM((max_cache, 3), jnp.float32)],
            interpret=interpret,
        )(cam, sph, pl_, lists, shl)
        # [T, 2]: culled-in main-sweep count, applied shadow-occluder
        # count; plus the broad-phase list lengths for the diagnostics.
        return counts[:, 0, :], lists[:, 0, 0], shl[:, 0, 0]

    return call


def soft_cache_stats(scene, camera, config: RenderConfig,
                     tau: float | None = None, bh: int | None = None,
                     bw: int | None = None, interpret: bool | None = None):
    """Per-tile clamp-cache demand of the shadowed forward at the
    production tile shape: returns (counts [n_tiles] int32 array of
    culled-in objects per tile, fwd_cache_slots, fused_cache_slots).
    A tile falls back to the exact re-walk iff its count exceeds the
    respective kernel's slot budget."""
    tau = config.soft_tau if tau is None else tau
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, bw = _pick_tiles(config, bh, bw)
    sph, pl_, counts_ = P.pack_scene(scene)
    cam = P.pack_camera(camera)
    cam = cam.at[0, C_NSPH].set(counts_[0].astype(jnp.float32))
    cam = cam.at[0, C_NPL].set(counts_[1].astype(jnp.float32))
    call = _build_cache_stats(config, float(tau), bh, bw, interpret)
    fwd_slots = max(2, min(_CACHE_SLOT_CAP, (7 * 2**20) // (3 * bh * bw * 4)))
    fused_slots = max(2, min(_CACHE_SLOT_CAP, (5 * 2**20) // (3 * bh * bw * 4)))
    counts, _, _ = call(sph, pl_, cam)
    return counts[:, 0], fwd_slots, fused_slots


def soft_tile_diagnostics(scene, camera, config: RenderConfig,
                          tau: float | None = None, bh: int | None = None,
                          bw: int | None = None,
                          interpret: bool | None = None) -> dict:
    """Per-tile work-profile of the shadowed production kernels at the
    production tile shape: everything the list-aware roofline model
    (utils/roofline.py::culled_step_model) needs to price the step's
    MINIMUM required execution time on this scene.

    Returns dict with int arrays over tiles: `main_applied` (objects that
    passed the in-kernel bound -> ran the heavy intersect+shade AND the
    backward vjp replay), `shadow_applied` (occluders whose transmittance
    ran), `list_len` / `shadow_list_len` (broad-phase list lengths ->
    how many lb / shadow-pre solves run), plus `bh`, `bw`, `n_planes`."""
    tau = config.soft_tau if tau is None else tau
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, bw = _pick_tiles(config, bh, bw)
    sph, pl_, counts_ = P.pack_scene(scene)
    cam = P.pack_camera(camera)
    cam = cam.at[0, C_NSPH].set(counts_[0].astype(jnp.float32))
    cam = cam.at[0, C_NPL].set(counts_[1].astype(jnp.float32))
    call = _build_cache_stats(config, float(tau), bh, bw, interpret)
    counts, list_len, sh_len = call(sph, pl_, cam)
    import numpy as np
    return {
        "main_applied": np.asarray(counts[:, 0]),
        "shadow_applied": np.asarray(counts[:, 1]),
        "list_len": np.asarray(list_len),
        "shadow_list_len": np.asarray(sh_len),
        "bh": bh, "bw": bw,
        "n_planes": int(counts_[1]),
    }
