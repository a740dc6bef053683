from rtwc_tpu.io.presenter import ConsolePresenter
from rtwc_tpu.io.sink import FramebufferSink
from rtwc_tpu.io.input import InputHandler, InputState

__all__ = ["ConsolePresenter", "FramebufferSink", "InputHandler", "InputState"]
