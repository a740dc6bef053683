"""Heads: ASCII ramp, ANSI-256 quantizer (pinned against the reference
table at ANSIRGB.h:39-112,143-176), and encoder round-trip."""
import re

import jax
import jax.numpy as jnp
import numpy as np

from rtwc_tpu.config import RenderConfig, RenderMode
from rtwc_tpu.heads import (
    ascii_indices,
    ASCII_RAMP,
    ansi256_from_rgb,
    rgb_from_ansi256,
    ANSI_PALETTE,
    framebuffer_to_cells,
    encode_frame,
)
from rtwc_tpu.heads.ansi256 import GREY_LUT
from rtwc_tpu.heads.encode import encode_frame_numpy
from rtwc_tpu.camera import default_camera
from rtwc_tpu.render import render_frame
from rtwc_tpu.scene import default_scene


class TestAsciiRamp:
    def test_ramp(self):
        assert len(ASCII_RAMP) == 68
        assert ASCII_RAMP[0] == " " and ASCII_RAMP[-1] == "@"
        assert ASCII_RAMP[1] == "." and ASCII_RAMP[24] == "1"

    def test_indices(self):
        far = 250.0
        shading = jnp.array([0.0, -1.0, 0.5, 1.0, 1.0])
        depth = jnp.array([10.0, 10.0, 10.0, 10.0, 9999.0])
        idx = np.asarray(ascii_indices(shading, depth, far))
        # clamp floor 1 (RayTracing.cu:36), miss -> 0
        assert idx.tolist() == [1, 1, int(np.ceil(0.5 * 67)), 67, 0]


class TestAnsi256:
    def test_palette_spot_values(self):
        # Values straight from the reference table (ANSIRGB.h:39-112).
        assert tuple(ANSI_PALETTE[16]) == (0, 0, 0)
        assert tuple(ANSI_PALETTE[21]) == (0, 0, 255)
        assert tuple(ANSI_PALETTE[59]) == (95, 95, 95)
        assert tuple(ANSI_PALETTE[231]) == (255, 255, 255)
        assert tuple(ANSI_PALETTE[232]) == (8, 8, 8)
        assert tuple(ANSI_PALETTE[255]) == (238, 238, 238)
        assert tuple(ANSI_PALETTE[1]) == (0xCD, 0, 0)

    def test_grey_lut_pinned(self):
        # Pinned entries of ansi256_from_grey (ANSIRGB.h:143-176).
        expected = {
            0: 16, 4: 16, 5: 232, 13: 232, 14: 233, 92: 59, 96: 59, 97: 241,
            132: 102, 136: 102, 137: 245, 246: 255, 247: 231, 255: 231,
        }
        for v, idx in expected.items():
            assert GREY_LUT[v] == idx, (v, GREY_LUT[v], idx)

    def test_grey_lut_full_table_vs_reference(self):
        # Parse the reference's 256-entry table and compare every entry of
        # the derived LUT against it (ANSIRGB.h:143-176).
        import os, re
        path = "/root/reference/ConsoleProject/ANSIRGB.h"
        if not os.path.exists(path):
            import pytest
            pytest.skip("reference tree not available")
        text = open(path, errors="ignore").read()
        m = re.search(r"ansi256_from_grey\[256\]\s*=\s*\{(.*?)\};", text, re.S)
        table = [int(x) for x in re.findall(r"\d+", m.group(1))]
        assert len(table) == 256
        np.testing.assert_array_equal(GREY_LUT.astype(int), np.array(table))

    def test_grey_shortcut(self):
        rgb = jnp.array([[50, 50, 50], [255, 255, 255], [0, 0, 0]])
        idx = np.asarray(ansi256_from_rgb(rgb))
        assert idx[0] == GREY_LUT[50]
        assert idx[1] == 231
        assert idx[2] == 16

    def test_roundtrip_palette_colors(self):
        # Quantizing an exact cube color must return a color at distance 0,
        # i.e. the palette entry must reproduce the rgb exactly.
        for index in [21, 46, 196, 226, 93, 160]:
            rgb = jnp.asarray(ANSI_PALETTE[index].astype(np.int32))
            got = int(ansi256_from_rgb(rgb))
            assert tuple(ANSI_PALETTE[got]) == tuple(ANSI_PALETTE[index])

    def test_matches_independent_scalar_implementation(self):
        # Element-wise comparison against an independent, scalar Python
        # transcription of the algorithm spec (ANSIRGB.h:141-189): grey
        # shortcut, luminance-picked grey candidate vs threshold-picked
        # cube candidate, weighted distance tiebreak (cube wins on <).
        thresholds = {
            0: [38, 115, 155, 196, 235],
            1: [36, 116, 154, 195, 235],
            2: [35, 115, 155, 195, 235],
        }
        levels = [0, 95, 135, 175, 215, 255]

        def scalar(r, g, b):
            if r == g == b:
                return int(GREY_LUT[r])
            lum = (3567664 * r + 11998547 * g + 1211005 * b + (1 << 23)) >> 24
            grey_idx = int(GREY_LUT[lum])

            def wdist(x, y):
                rs = x[0] + y[0]
                return ((1024 + rs) * (x[0] - y[0]) ** 2 + 2048 * (x[1] - y[1]) ** 2
                        + (1534 - rs) * (x[2] - y[2]) ** 2)

            grey_d = wdist((r, g, b), tuple(int(c) for c in ANSI_PALETTE[grey_idx]))
            comps, cube_idx = [], 16
            for ci, v in enumerate((r, g, b)):
                lvl = sum(v >= t for t in thresholds[ci])
                comps.append(levels[lvl])
                cube_idx += lvl * (36, 6, 1)[ci]
            cube_d = wdist((r, g, b), tuple(comps))
            return cube_idx if cube_d < grey_d else grey_idx

        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, size=(256, 3)).astype(np.int32)
        # include edge values
        rgb = np.concatenate([rgb, [[0, 0, 0], [255, 255, 255], [38, 36, 35],
                                    [37, 35, 34], [235, 235, 234]]])
        got = np.asarray(ansi256_from_rgb(jnp.asarray(rgb)))
        want = np.array([scalar(*v) for v in rgb])
        np.testing.assert_array_equal(got, want)


def _decode(stream: bytes, width: int):
    """Minimal ANSI decoder: reconstruct per-cell (kind, color, char) from a
    minimized stream (the SURVEY section 4 round-trip strategy)."""
    rows = stream.split(b"\n")[:-1]
    esc = re.compile(rb"\x1b\[(38|48);(?:5;(\d+)|2;(\d*);(\d*);(\d*))m")
    grid = []
    state = None
    for row in rows:
        cells = []
        i = 0
        while i < len(row):
            m = esc.match(row, i)
            if m:
                if m.group(2) is not None:
                    state = (1 if m.group(1) == b"38" else 0, int(m.group(2)))
                else:
                    state = (
                        1 if m.group(1) == b"38" else 0,
                        tuple(int(g or b"0") for g in m.group(3, 4, 5)),
                    )
                i = m.end()
            else:
                cells.append((state, row[i]))
                i += 1
        assert len(cells) == width, (len(cells), width)
        grid.append(cells)
    return grid


class TestEncoder:
    def _cells(self, mode):
        cfg = RenderConfig(width=60, height=40, mode=mode)
        fb = render_frame(default_scene(), default_camera(), cfg)
        return framebuffer_to_cells(fb, cfg)

    def test_roundtrip_256(self):
        kind, color, char = map(np.asarray, self._cells(RenderMode.BIT_ASCII))
        stream = encode_frame_numpy(kind, color, char)
        grid = _decode(stream, 60)
        for r in range(40):
            for c in range(60):
                (k, col), ch = grid[r][c]
                assert k == kind[r, c]
                assert col == color[r, c]
                assert ch == char[r, c]

    def test_roundtrip_truecolor(self):
        kind, color, char = map(np.asarray, self._cells(RenderMode.RGB_PIXEL))
        stream = encode_frame_numpy(kind, color, char)
        grid = _decode(stream, 60)
        for r in range(40):
            for c in range(60):
                (k, col), ch = grid[r][c]
                assert k == kind[r, c]
                assert col == tuple(color[r, c])
                assert ch == char[r, c]

    def test_minimization_shrinks(self):
        kind, color, char = map(np.asarray, self._cells(RenderMode.RGB_PIXEL))
        stream = encode_frame_numpy(kind, color, char)
        unminimized = 20 * 60 * 40
        assert len(stream) < unminimized

    def test_run_length_single_color(self):
        kind = np.zeros((2, 4), np.int64)
        color = np.full((2, 4), 16, np.int64)
        char = np.full((2, 4), ord("x"), np.int64)
        stream = encode_frame_numpy(kind, color, char)
        # one escape, then bare glyphs + newlines
        assert stream == b"\x1b[48;5;16mxxxx\nxxxx\n"

    def test_all_modes_encode(self):
        for mode in (RenderMode.BIT_ASCII, RenderMode.BIT_PIXEL, RenderMode.RGB_ASCII,
                     RenderMode.RGB_PIXEL, RenderMode.RGB_NORMALS):
            kind, color, char = map(np.asarray, self._cells(mode))
            stream = encode_frame(kind, color, char)
            assert stream.count(b"\n") == 40


def test_quantize_rgb_ste_forward_is_palette_color():
    """STE head forward = the palette color of the chosen ANSI-256 index
    (exact ANSIRGB.h:141-189 quantization), SURVEY section 2 row 9."""
    from rtwc_tpu.heads.ansi256 import (ansi256_from_rgb, quantize_rgb_ste,
                                        rgb_from_ansi256)

    rng = np.random.RandomState(3)
    rgb = jnp.asarray(rng.randint(0, 256, size=(31, 7, 3)).astype(np.float32))
    out = quantize_rgb_ste(rgb)
    want = rgb_from_ansi256(ansi256_from_rgb(rgb)).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    # every output triple is an actual palette entry
    pal = {tuple(c) for c in np.asarray(rgb_from_ansi256(jnp.arange(256)))}
    flat = np.asarray(out).reshape(-1, 3).astype(np.int64)
    assert all(tuple(c) in pal for c in flat)


def test_quantize_rgb_ste_backward_is_identity():
    """STE head backward = identity: the quantizer's zero-a.e. jacobian is
    replaced by I so gradients flow through the console image."""
    from rtwc_tpu.heads.ansi256 import quantize_rgb_ste

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(0, 255, size=(5, 4, 3)).astype(np.float32))
    ct = jnp.asarray(rng.randn(5, 4, 3).astype(np.float32))
    _, vjp = jax.vjp(quantize_rgb_ste, x)
    np.testing.assert_array_equal(np.asarray(vjp(ct)[0]), np.asarray(ct))
    # and through a scalar loss: d/dx sum(q(x)) == ones
    g = jax.grad(lambda x: jnp.sum(quantize_rgb_ste(x)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(np.asarray(g)))
