"""Runtime telemetry: the reference's two FPS counters (rendering FPS in the
engine loop, Engine3D.cpp:48-49,60-68; printing FPS in the print thread,
PrintMachine.cpp:261-272) plus the BASELINE metric rays/sec, plus optional
jax.profiler trace hooks (SURVEY.md section 5)."""
from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("rtwc_tpu")


class Telemetry:
    def __init__(self, rays_per_frame: int, update_interval_s: float = 1.0):
        self.rays_per_frame = rays_per_frame
        self.interval = update_interval_s
        self._frames = 0
        self._t0 = time.perf_counter()
        self.fps = 0.0
        self.rays_per_sec = 0.0

    def tick(self) -> bool:
        """Count one frame; returns True once per interval (the 1 Hz edge
        the engine uses for FPS publication and sphere spawning)."""
        self._frames += 1
        now = time.perf_counter()
        elapsed = now - self._t0
        if elapsed >= self.interval:
            self.fps = self._frames / elapsed
            self.rays_per_sec = self.fps * self.rays_per_frame
            self._frames = 0
            self._t0 = now
            return True
        return False


@contextlib.contextmanager
def profiler_trace(dir: str | None):
    """Wrap a region in a jax.profiler trace when a directory is given."""
    if not dir:
        yield
        return
    import jax

    jax.profiler.start_trace(dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
