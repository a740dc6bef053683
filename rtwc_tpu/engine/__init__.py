from rtwc_tpu.engine.engine import Engine

__all__ = ["Engine"]
