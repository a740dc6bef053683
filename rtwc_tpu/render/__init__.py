from rtwc_tpu.render.reference import (
    Framebuffer,
    intersect_spheres,
    intersect_planes,
    trace_hard,
    blinn_phong,
    render_frame,
)
from rtwc_tpu.render.softmin import trace_soft, render_frame_soft

__all__ = [
    "Framebuffer",
    "intersect_spheres",
    "intersect_planes",
    "trace_hard",
    "blinn_phong",
    "render_frame",
    "trace_soft",
    "render_frame_soft",
]
