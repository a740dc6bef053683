"""Native C++ ANSI encoder vs the NumPy reference implementation.

The C++ pass (rtwc_tpu/io/native/ansi_encoder.cpp) is the runtime analogue
of the reference's Minimize8bit/MinimizeRGB host loops
(RayTracingManager.cu:167-319); it must produce byte-identical streams to
encode.encode_frame_numpy for every frame."""
import shutil

import numpy as np
import pytest

from rtwc_tpu.heads.encode import encode_frame_numpy

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ compiler available"
)


def _native():
    from rtwc_tpu.io.native import encode_frame_native

    return encode_frame_native


def _random_frame(rng, H, W, truecolor, runs=False):
    kind = rng.integers(0, 2, size=(H, W))
    if truecolor:
        color = rng.integers(0, 256, size=(H, W, 3))
    else:
        color = rng.integers(0, 256, size=(H, W))
    if runs:
        # long constant runs: the minimization-heavy regime
        color[:, : W // 2] = color[:1, :1] if not truecolor else color[:1, :1, :]
        kind[:, : W // 2] = kind[0, 0]
    char = rng.integers(32, 127, size=(H, W))
    return kind, color, char


@pytest.mark.parametrize("truecolor", [False, True])
@pytest.mark.parametrize("runs", [False, True])
def test_native_matches_numpy_fuzz(truecolor, runs):
    enc = _native()
    rng = np.random.default_rng(42 + truecolor + 2 * runs)
    for _ in range(10):
        H, W = int(rng.integers(1, 40)), int(rng.integers(1, 120))
        kind, color, char = _random_frame(rng, H, W, truecolor, runs)
        assert enc(kind, color, char) == encode_frame_numpy(kind, color, char)


def test_native_single_cell():
    enc = _native()
    kind = np.array([[1]])
    color = np.array([[7]])
    char = np.array([[ord("x")]])
    assert enc(kind, color, char) == b"\x1b[38;5;7mx\n"


def test_native_uniform_frame_minimizes():
    """A constant-color frame emits exactly one escape sequence."""
    enc = _native()
    H, W = 16, 64
    kind = np.zeros((H, W), int)
    color = np.full((H, W), 123)
    char = np.full((H, W), ord("#"))
    out = enc(kind, color, char)
    assert out.count(b"\x1b[") == 1
    assert out == encode_frame_numpy(kind, color, char)


def test_engine_uses_native_encoder():
    """encode_frame (the engine's entry) dispatches to the native path."""
    from rtwc_tpu.heads.encode import encode_frame

    rng = np.random.default_rng(0)
    kind, color, char = _random_frame(rng, 8, 32, truecolor=True)
    assert encode_frame(kind, color, char) == encode_frame_numpy(kind, color, char)
