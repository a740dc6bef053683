"""Host-side ANSI escape-stream encoder with run-length minimization.

Replaces the reference's fixed-stride device char framebuffer (12 B/cell
256-color, 20 B/cell truecolor, RayTracing.h:121-124) plus its CPU
Minimize8bit/MinimizeRGB passes (RayTracingManager.cu:167-319). Same
output contract: one escape sequence only when the cell color changes from
the previously emitted color (carried across rows), bare glyphs otherwise,
'\n' per row.

Differences from the reference, on purpose:
  - no NUL padding bytes inside escapes (the reference memcpy's '\\0' digit
    placeholders into the console stream, RayTracing.cu:231-237);
  - the change test compares foreground/background kind as well as the
    color digits (the reference compares digits only,
    RayTracingManager.cu:197-202, which can glue a fg cell to a previous
    bg cell of equal index).

Two implementations: a fully vectorized NumPy one (below) and a C++ one
(native/ansi_encoder.cpp, used automatically when built - the per-frame
byte pass is the host hot loop at large resolutions).
"""
from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("rtwc_tpu")

_ESC, _LB, _SEMI, _M, _NL = 0x1B, ord("["), ord(";"), ord("m"), ord("\n")
_D0 = ord("0")


def _digits(v: np.ndarray):
    """(d100, d10, d1) ASCII bytes + visibility masks (leading-zero drop)."""
    d100 = v // 100
    d10 = (v // 10) % 10
    d1 = v % 10
    return (
        (_D0 + d100).astype(np.uint8),
        (_D0 + d10).astype(np.uint8),
        (_D0 + d1).astype(np.uint8),
        v >= 100,
        v >= 10,
    )


def _change_mask(key: np.ndarray) -> np.ndarray:
    """True where a cell's (kind, color) differs from the previous cell in
    row-major order; the first cell always emits (latestColor == nullptr,
    RayTracingManager.cu:197)."""
    flat = key.reshape(key.shape[0] * key.shape[1], -1)
    change = np.empty(flat.shape[0], bool)
    change[0] = True
    change[1:] = (flat[1:] != flat[:-1]).any(axis=-1)
    return change


def encode_frame_numpy(kind: np.ndarray, color: np.ndarray, char: np.ndarray) -> bytes:
    """Encode one frame of cells to a minimized ANSI byte stream.

    kind: [H, W] 0=background ('48'), 1=foreground ('38')
    color: [H, W] int (256-color index) or [H, W, 3] int (truecolor)
    char: [H, W] int glyph codes
    """
    H, W = kind.shape
    truecolor = color.ndim == 3
    n = H * W
    key = np.concatenate(
        [kind.reshape(H, W, 1), color.reshape(H, W, -1)], axis=-1
    ).astype(np.int32)
    change = _change_mask(key)

    k_byte = np.where(kind.reshape(n) == 1, ord("3"), ord("4")).astype(np.uint8)
    ch = char.reshape(n).astype(np.uint8)

    if not truecolor:
        L = 12
        rec = np.zeros((n, L), np.uint8)
        valid = np.zeros((n, L), bool)
        d100, d10, d1, m100, m10 = _digits(color.reshape(n).astype(np.int32))
        rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3] = _ESC, _LB, k_byte, ord("8")
        rec[:, 4], rec[:, 5], rec[:, 6] = _SEMI, ord("5"), _SEMI
        rec[:, 7], rec[:, 8], rec[:, 9] = d100, d10, d1
        rec[:, 10], rec[:, 11] = _M, ch
        valid[change, :] = True
        valid[:, 7] &= m100
        valid[:, 8] &= m10
        valid[:, 11] = True
    else:
        L = 20
        rec = np.zeros((n, L), np.uint8)
        valid = np.zeros((n, L), bool)
        rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3] = _ESC, _LB, k_byte, ord("8")
        rec[:, 4], rec[:, 5], rec[:, 6] = _SEMI, ord("2"), _SEMI
        c = color.reshape(n, 3).astype(np.int32)
        digit_masks = np.zeros((n, 6), bool)  # (r100, r10, g100, g10, b100, b10)
        offs = [(7, 10), (11, 14), (15, 18)]
        for ci, (start, sep) in enumerate(offs):
            d100, d10, d1, m100, m10 = _digits(c[:, ci])
            rec[:, start], rec[:, start + 1], rec[:, start + 2] = d100, d10, d1
            digit_masks[:, 2 * ci] = m100
            digit_masks[:, 2 * ci + 1] = m10
            if sep < 18:
                rec[:, sep] = _SEMI
        rec[:, 18], rec[:, 19] = _M, ch
        valid[change, :] = True
        digit_cols = [7, 8, 11, 12, 15, 16]
        valid[:, digit_cols] = digit_masks & change[:, None]
        valid[:, 19] = True

    # Append one '\n' per row (RayTracingManager.cu:225-239).
    rec = rec.reshape(H, W, L)
    valid = valid.reshape(H, W, L)
    nl_rec = np.zeros((H, 1, L), np.uint8)
    nl_rec[:, 0, 0] = _NL
    nl_valid = np.zeros((H, 1, L), bool)
    nl_valid[:, 0, 0] = True
    rec = np.concatenate([rec, nl_rec], axis=1)
    valid = np.concatenate([valid, nl_valid], axis=1)
    return rec[valid].tobytes()


_native_failed = False


def encode_frame(kind, color, char) -> bytes:
    """Encode cells to ANSI bytes, preferring the native C++ encoder."""
    global _native_failed
    kind = np.asarray(kind)
    color = np.asarray(color)
    char = np.asarray(char)
    if not _native_failed:
        try:
            from rtwc_tpu.io.native import encode_frame_native

            return encode_frame_native(kind, color, char)
        except Exception as e:
            # A broken toolchain / ABI drift silently costing ~9x encoder
            # throughput is a diagnosable event: warn once, then stay on
            # the NumPy path without re-attempting the import each frame.
            _native_failed = True
            log.warning("native ANSI encoder unavailable (%s); falling back "
                        "to the NumPy encoder", e)
    return encode_frame_numpy(kind, color, char)
