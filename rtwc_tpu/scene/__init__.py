from rtwc_tpu.scene.scene import (
    Spheres,
    Planes,
    Scene,
    empty_scene,
    add_sphere,
    add_plane,
    default_scene,
    grow_scene,
    random_scene,
    spawn_random_sphere,
    update_scene,
)
from rtwc_tpu.scene.io import save_scene, load_scene

__all__ = [
    "Spheres",
    "Planes",
    "Scene",
    "empty_scene",
    "add_sphere",
    "add_plane",
    "default_scene",
    "grow_scene",
    "random_scene",
    "spawn_random_sphere",
    "update_scene",
    "save_scene",
    "load_scene",
]
