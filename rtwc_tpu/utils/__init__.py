from rtwc_tpu.utils.timer import Timer
from rtwc_tpu.utils.telemetry import Telemetry

__all__ = ["Timer", "Telemetry"]
