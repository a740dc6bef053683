"""Input parsing: keys, F-keys, arrows, SGR mouse reports, quit semantics.

The reference polls Win32 key state + cursor position (Engine3D.cpp:110-240);
here the equivalent event stream is bytes on stdin, so the parser is the
unit under test: feed synthetic byte sequences, assert the InputState.
"""
import rtwc_tpu.io.input as input_mod
from rtwc_tpu.config import RenderMode
from rtwc_tpu.io.input import InputHandler


def make_handler(chunks):
    """Handler whose _read_pending yields the given chunks in order."""
    h = InputHandler(stream=None, mouse=True)
    it = iter(chunks)
    h._read_pending = lambda: next(it, "")
    return h


def test_wasd_held_then_released():
    h = make_handler(["wa", ""])
    st = h.poll()
    assert st.keys.w == 1 and st.keys.a == 1 and st.keys.s == 0
    assert not st.quit


def test_mode_digits_and_fkeys():
    h = make_handler(["3"])
    assert h.poll().mode == RenderMode.RGB_ASCII
    h = make_handler(["\x1bOP"])
    assert h.poll().mode == RenderMode.BIT_ASCII
    h = make_handler(["\x1b[15~"])
    assert h.poll().mode == RenderMode.RGB_NORMALS


def test_arrow_look():
    h = make_handler(["\x1b[A\x1b[C"])
    st = h.poll()
    assert st.rot_delta == (40.0, -40.0)


def test_bare_escape_quits_but_csi_does_not():
    # A lone ESC could be the first byte of a split escape sequence, so it
    # is carried for one poll; it quits only when still unaccompanied.
    h = make_handler(["\x1b", ""])
    assert not h.poll().quit
    assert h.poll().quit
    assert make_handler(["q"]).poll().quit
    # unknown CSI (e.g. a focus event) must NOT quit
    st = make_handler(["\x1b[I"]).poll()
    assert not st.quit


def test_read_boundary_right_after_esc_does_not_quit():
    """A mouse report whose read boundary falls immediately after the ESC
    byte (empty rest) must be finished on the next poll, never treated as
    the bare-Esc quit (high-volume DECSET 1003 streams split anywhere)."""
    h = make_handler(["\x1b[<35;80;24M\x1b", "[<35;80;20M"])
    st = h.poll()
    assert not st.quit
    st = h.poll()
    assert not st.quit
    assert st.rot_delta == (4 * input_mod._CELL_PX_Y, 0.0)


def test_sgr_mouse_deltas():
    # first report sets the anchor, second yields the delta
    h = make_handler(["\x1b[<35;80;24M", "\x1b[<35;78;23M"])
    st = h.poll()
    assert st.rot_delta == (0.0, 0.0)
    st = h.poll()
    # moved 2 cells left, 1 cell up => positive yaw and pitch (pixel units)
    assert st.rot_delta == (1 * input_mod._CELL_PX_Y, 2 * input_mod._CELL_PX_X)
    assert not st.quit


def test_sgr_mouse_release_and_press_parsed():
    h = make_handler(["\x1b[<0;10;10M\x1b[<0;10;12m"])
    st = h.poll()
    assert st.rot_delta == (-2 * input_mod._CELL_PX_Y, 0.0)


def test_split_escape_sequence_across_reads():
    """A mouse report split mid-sequence must be carried to the next poll,
    not misread as a bare-Esc quit."""
    h = make_handler(["\x1b[<35;80;24M\x1b[<35;8", "0;20M"])
    st = h.poll()
    assert not st.quit
    st = h.poll()
    assert st.rot_delta == (4 * input_mod._CELL_PX_Y, 0.0)


def test_mixed_stream():
    h = make_handler(["w\x1b[<35;5;5Md\x1b[B2"])
    st = h.poll()
    assert st.keys.w == 1 and st.keys.d == 1
    assert st.mode == RenderMode.BIT_PIXEL
    assert st.rot_delta == (-40.0, 0.0)  # arrow down only; mouse anchored
    assert not st.quit


def test_no_tty_poll_is_inert():
    h = InputHandler(stream=None)
    h.start()  # stream=None has no fileno; must not raise
    st = h.poll()
    assert not st.quit and st.mode is None
    h.cleanup()
