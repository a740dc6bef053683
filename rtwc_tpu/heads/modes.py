"""Rendering-mode heads: framebuffer -> per-cell (kind, color, char) arrays.

The reference bakes each of its five modes into a separate 800-line CUDA
kernel that formats ANSI bytes inline (RayTracing.cu:170-795). Here a mode
is a tiny pure function over the Framebuffer pytree; the byte formatting
lives in the encoder (heads/encode.py), host-side, where byte-string work
belongs.

Cell representation (device-side, all static shapes):
  kind  [H, W] int32: 0 = background escape, 1 = foreground escape
  color [H, W] int32 (256-color index)  or  [H, W, 3] int32 (truecolor)
  char  [H, W] int32 ascii code of the glyph
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rtwc_tpu.config import RenderConfig, RenderMode
from rtwc_tpu.heads.ansi256 import ansi256_from_rgb
from rtwc_tpu.heads.ascii import ascii_indices, NUM_ASCII, ASCII_RAMP
from rtwc_tpu.render.reference import Framebuffer

_SPACE = 32
_ASCII_CODES = jnp.asarray([ord(c) for c in ASCII_RAMP], jnp.int32)


def _ascii_chars(fb: Framebuffer, far: float) -> jax.Array:
    idx = ascii_indices(fb.shading, fb.depth, far)
    return _ASCII_CODES[idx]


def _trunc_u8(x: jax.Array) -> jax.Array:
    """The reference casts shaded floats with (uint8_t) - C truncation
    (RayTracing.cu:210,291). Values are pre-clamped to [0, 255]."""
    return jnp.clip(x, 0.0, 255.0).astype(jnp.int32)


def framebuffer_to_cells(fb: Framebuffer, config: RenderConfig):
    """Dispatch on rendering mode (RayTracing::RayTrace switch,
    RayTracing.cu:797-867). Returns (kind, color, char); color is [H,W]
    for the 256-color modes and [H,W,3] for the truecolor modes.
    Jittable; runs on-device so only the compact cell arrays travel to host.
    """
    mode = config.mode
    hit = fb.hit
    # Color visibility: any touched cell shows its (AA-pooled) color - under
    # supersampling a silhouette cell with <50% coverage still carries the
    # anti-aliased blend (pooled rgb is darkened by its miss-black
    # subsamples). Glyph fg/bg decisions below keep the majority `hit` rule.
    # Without AA, coverage == hit as float, so this is the same mask.
    visible = fb.coverage > 0.0
    H, W = fb.depth.shape

    if mode in (RenderMode.BIT_ASCII, RenderMode.BIT_PIXEL):
        idx = ansi256_from_rgb(_trunc_u8(fb.rgb))
        color = jnp.where(visible, idx, 16)  # miss: bg colour 16 (RayTracing.cu:244-251)
        if mode == RenderMode.BIT_ASCII:
            kind = jnp.where(hit, 1, 0)  # fg for hits, bg for misses
            char = jnp.where(hit, _ascii_chars(fb, config.far), _SPACE)
        else:
            kind = jnp.zeros((H, W), jnp.int32)  # always background blocks
            char = jnp.full((H, W), _SPACE, jnp.int32)
        return kind, color.astype(jnp.int32), char.astype(jnp.int32)

    if mode == RenderMode.RGB_ASCII:
        color = jnp.where(visible[..., None], _trunc_u8(fb.rgb), 0)
        kind = jnp.where(hit, 1, 0)
        char = jnp.where(hit, _ascii_chars(fb, config.far), _SPACE)
        return kind, color, char.astype(jnp.int32)

    if mode == RenderMode.RGB_PIXEL:
        color = jnp.where(visible[..., None], _trunc_u8(fb.rgb), 0)
        kind = jnp.zeros((H, W), jnp.int32)
        char = jnp.full((H, W), _SPACE, jnp.int32)
        return kind, color, char

    if mode == RenderMode.RGB_NORMALS:
        # Normals debug view (RayTracing.cu:612-752). The reference feeds
        # normal*255 through a (uint8_t) cast, wrapping negatives (UB in C);
        # we clamp to [0,255] instead - same intent, defined behavior.
        color = jnp.where(visible[..., None], _trunc_u8(fb.normal * 255.0), 0)
        kind = jnp.zeros(fb.depth.shape, jnp.int32)
        char = jnp.full(fb.depth.shape, _SPACE, jnp.int32)
        return kind, color, char

    raise ValueError(f"mode {mode} has no cell head (HEADLESS uses the raw framebuffer)")
