from rtwc_tpu.heads.ascii import ascii_indices, ASCII_RAMP, NUM_ASCII
from rtwc_tpu.heads.ansi256 import ansi256_from_rgb, rgb_from_ansi256, ANSI_PALETTE
from rtwc_tpu.heads.modes import framebuffer_to_cells
from rtwc_tpu.heads.encode import encode_frame

__all__ = [
    "ascii_indices",
    "ASCII_RAMP",
    "NUM_ASCII",
    "ansi256_from_rgb",
    "rgb_from_ansi256",
    "ANSI_PALETTE",
    "framebuffer_to_cells",
    "encode_frame",
]
