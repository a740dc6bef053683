from rtwc_tpu.utils.timer import Timer
from rtwc_tpu.utils.telemetry import Telemetry, profiler_trace

__all__ = ["Timer", "Telemetry", "profiler_trace"]
