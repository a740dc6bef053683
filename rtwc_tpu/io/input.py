"""Non-blocking POSIX keyboard input.

Replaces Engine3D::CheckKeyboard's Win32 GetKeyState/GetCursorPos polling
(Engine3D.cpp:110-240). A terminal delivers key *events* (with autorepeat),
not key *state*, so held keys are emulated: each WASD/space/'c' event arms
its key for `hold_s` seconds (tuned to typical autorepeat) and the engine
reads a PressedKeys-style snapshot every frame. Mouse look becomes arrow
keys / hjkl (terminal mouse reporting is intentionally out of scope).

Bindings (reference parity, Engine3D.cpp:113-197):
  w/a/s/d   move            (GetKeyState W/A/S/D)
  space     up, c           down (VK_SPACE / VK_SHIFT - shift state is not
                             readable on a tty, 'c' stands in)
  arrows    look            (mouse deltas -> AddRot)
  1..5 / F1..F5             rendering mode switch
  q / Esc   quit            (VK_ESCAPE)
"""
from __future__ import annotations

import dataclasses
import os
import select
import sys
import time

from rtwc_tpu.camera import Keys
from rtwc_tpu.config import RenderMode

_MODE_BY_DIGIT = {
    "1": RenderMode.BIT_ASCII,
    "2": RenderMode.BIT_PIXEL,
    "3": RenderMode.RGB_ASCII,
    "4": RenderMode.RGB_PIXEL,
    "5": RenderMode.RGB_NORMALS,
}
# F1-F5 escape sequences (xterm: ESC O P..S, ESC [ 1 5 ~).
_MODE_BY_FKEY = {
    "OP": RenderMode.BIT_ASCII,
    "OQ": RenderMode.BIT_PIXEL,
    "OR": RenderMode.RGB_ASCII,
    "OS": RenderMode.RGB_PIXEL,
    "[15~": RenderMode.RGB_NORMALS,
}
_ARROW_ROT = {  # (pitch_delta, yaw_delta) in "mouse pixel" units
    "[A": (40.0, 0.0),
    "[B": (-40.0, 0.0),
    "[C": (0.0, -40.0),
    "[D": (0.0, 40.0),
}


@dataclasses.dataclass
class InputState:
    keys: Keys
    rot_delta: tuple  # (dp, dy)
    mode: RenderMode | None
    quit: bool


class InputHandler:
    """cbreak-mode stdin poller; restores termios on cleanup."""

    def __init__(self, stream=None, hold_s: float = 0.25):
        self._stream = stream if stream is not None else sys.stdin
        self._hold_s = hold_s
        self._held: dict[str, float] = {}
        self._old_attrs = None
        self._fd = None

    def start(self) -> None:
        try:
            import termios
            import tty

            self._fd = self._stream.fileno()
            if os.isatty(self._fd):
                self._old_attrs = termios.tcgetattr(self._fd)
                tty.setcbreak(self._fd)
        except Exception:
            self._fd = None

    def cleanup(self) -> None:
        if self._old_attrs is not None and self._fd is not None:
            import termios

            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._old_attrs)
            self._old_attrs = None

    def _read_pending(self) -> str:
        if self._fd is None:
            return ""
        chunks = []
        try:
            while select.select([self._fd], [], [], 0)[0]:
                data = os.read(self._fd, 64)
                if not data:
                    break
                chunks.append(data.decode(errors="ignore"))
        except Exception:
            return ""
        return "".join(chunks)

    def poll(self) -> InputState:
        now = time.monotonic()
        buf = self._read_pending()
        rot = [0.0, 0.0]
        mode = None
        quit_ = False

        i = 0
        while i < len(buf):
            ch = buf[i]
            if ch == "\x1b":
                matched = False
                for seq, m in _MODE_BY_FKEY.items():
                    if buf.startswith(seq, i + 1):
                        mode, i, matched = m, i + 1 + len(seq), True
                        break
                if not matched:
                    for seq, (dp, dy) in _ARROW_ROT.items():
                        if buf.startswith(seq, i + 1):
                            rot[0] += dp
                            rot[1] += dy
                            i += 1 + len(seq)
                            matched = True
                            break
                if not matched:
                    # bare escape = quit (VK_ESCAPE, Engine3D.cpp:172-175)
                    quit_ = True
                    i += 1
                continue
            lo = ch.lower()
            if lo in "wasd c":
                self._held[" " if ch == " " else lo] = now
            elif lo in _MODE_BY_DIGIT:
                mode = _MODE_BY_DIGIT[lo]
            elif lo == "q":
                quit_ = True
            i += 1

        def held(k: str) -> int:
            return int(now - self._held.get(k, -1e9) < self._hold_s)

        keys = Keys(
            w=held("w"), a=held("a"), s=held("s"), d=held("d"),
            space=held(" "), shift=held("c"),
        )
        return InputState(keys=keys, rot_delta=(rot[0], rot[1]), mode=mode, quit=quit_)
