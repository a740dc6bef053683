from rtwc_tpu.render.reference import (
    Framebuffer,
    intersect_spheres,
    intersect_planes,
    trace_hard,
    blinn_phong,
    render_frame,
    supersampled_config,
    downsample_framebuffer,
)
from rtwc_tpu.render.softmin import trace_soft, render_frame_soft

__all__ = [
    "Framebuffer",
    "intersect_spheres",
    "intersect_planes",
    "trace_hard",
    "blinn_phong",
    "render_frame",
    "supersampled_config",
    "downsample_framebuffer",
    "trace_soft",
    "render_frame_soft",
]
