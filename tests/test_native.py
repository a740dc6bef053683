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


# -- native print machine (print_machine.cpp) --------------------------------


def _read_until(fd, needle: bytes, limit: float = 5.0) -> bytes:
    """Read from fd until needle appears (or timeout)."""
    import os
    import select
    import time

    buf = b""
    deadline = time.monotonic() + limit
    while needle not in buf and time.monotonic() < deadline:
        r, _, _ = select.select([fd], [], [], 0.1)
        if r:
            buf += os.read(fd, 65536)
    return buf


def test_native_print_machine_blits_frames():
    """The C++ print thread writes ESC[H + frame (+ FPS overlay) to the fd,
    updates printing FPS, and stops cleanly."""
    import os

    from rtwc_tpu.io.native import NativePrintMachine

    r, w = os.pipe()
    try:
        pm = NativePrintMachine(w, show_fps=True)
        assert pm.running()
        pm.set_rendering_fps(42.0)
        pm.publish(b"FRAME-ONE")
        out = _read_until(r, b"FRAME-ONE")
        assert b"\x1b[HFRAME-ONE" in out
        assert b"Rendering FPS:     42.0" in out
        pm.publish(b"FRAME-TWO")
        out = _read_until(r, b"FRAME-TWO")
        assert b"\x1b[HFRAME-TWO" in out
        pm.stop()
        assert pm._h is None
    finally:
        os.close(r)
        os.close(w)


def test_native_print_machine_detects_broken_pipe():
    """A dead output (console gone) must flip running() to False - the
    engine's liveness probe sees it like the reference's dead print thread
    (Engine3D.cpp:33-37)."""
    import os
    import signal
    import time

    from rtwc_tpu.io.native import NativePrintMachine

    # writes to a closed pipe raise SIGPIPE by default: ignore for the test
    old = signal.signal(signal.SIGPIPE, signal.SIG_IGN)
    try:
        r, w = os.pipe()
        pm = NativePrintMachine(w, show_fps=False)
        pm.publish(b"X")
        _read_until(r, b"X")
        os.close(r)
        deadline = time.monotonic() + 5.0
        while pm.running() and time.monotonic() < deadline:
            pm.publish(b"Y")  # next write hits EPIPE -> thread terminates
            time.sleep(0.02)
        assert not pm.running()
        pm.stop()
        os.close(w)
    finally:
        signal.signal(signal.SIGPIPE, old)


def test_presenter_uses_native_backend_on_fd():
    """ConsolePresenter picks the native print machine for fd-backed
    outputs and produces the same stream contract."""
    import os

    from rtwc_tpu.io import ConsolePresenter

    r, w = os.pipe()
    try:
        out = os.fdopen(w, "wb", buffering=0)
        p = ConsolePresenter(10, 4, out=out, show_fps=False, backend="native")
        p.start()
        assert p._native is not None
        assert p.check_if_running()
        p.set_data_in_back_buffer(b"HELLO-NATIVE")
        got = _read_until(r, b"HELLO-NATIVE")
        assert b"\x1b[HHELLO-NATIVE" in got
        p.cleanup()
        assert not p.check_if_running()
    finally:
        os.close(r)
        try:
            out.close()
        except Exception:
            pass
