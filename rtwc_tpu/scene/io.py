"""Scene / camera checkpointing.

The reference has no save/load at all (SURVEY.md section 5: scene hardcoded at
Scene3D.cpp:28-33). Pytrees make it trivial, and the inverse-rendering
workflow (BASELINE config 3) needs it. Plain .npz - no extra deps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rtwc_tpu.scene.scene import Scene, Spheres, Planes


def save_scene(path: str, scene: Scene, camera=None) -> None:
    """Write scene (and optionally camera pose) to an .npz file."""
    data = {}
    for prefix, node in (("spheres", scene.spheres), ("planes", scene.planes)):
        for name, leaf in vars(node).items():
            data[f"{prefix}.{name}"] = np.asarray(leaf)
    if camera is not None:
        data["camera.pos"] = np.asarray(camera.pos)
        data["camera.rot"] = np.asarray(camera.rot)
    np.savez(path, **data)


def load_scene(path: str):
    """Load a scene saved by save_scene. Returns (scene, camera_or_None)."""
    from rtwc_tpu.camera import Camera  # local import to avoid a cycle

    z = np.load(path)
    def grab(prefix, cls, fields):
        return cls(**{f: jnp.asarray(z[f"{prefix}.{f}"]) for f in fields})

    scene = Scene(
        spheres=grab("spheres", Spheres, ["center", "radius", "color", "speed", "mover", "active"]),
        planes=grab("planes", Planes, ["center", "normal", "color", "width", "height", "active"]),
    )
    camera = None
    if "camera.pos" in z:
        camera = Camera(pos=jnp.asarray(z["camera.pos"]), rot=jnp.asarray(z["camera.rot"]))
    return scene, camera
