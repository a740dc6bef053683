from rtwc_tpu.camera.camera import (
    Camera,
    default_camera,
    basis,
    static_basis,
    projection_elements,
    camera_rays,
)
from rtwc_tpu.camera.controller import Keys, move, add_rot

__all__ = [
    "Camera",
    "default_camera",
    "basis",
    "static_basis",
    "projection_elements",
    "camera_rays",
    "Keys",
    "move",
    "add_rot",
]
