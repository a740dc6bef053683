"""End-to-end engine loop with a headless sink (no tty needed)."""
import numpy as np

from rtwc_tpu.config import EngineConfig, RenderConfig, RenderMode
from rtwc_tpu.engine import Engine
from rtwc_tpu.io import FramebufferSink


def _engine(mode=RenderMode.RGB_PIXEL, spawn=False, **kw):
    rcfg = RenderConfig(width=40, height=24, mode=mode, max_spheres=16, max_planes=4)
    ecfg = EngineConfig(spawn=spawn, show_fps=False, seed=1)
    sink = FramebufferSink(keep_all=True)
    return Engine(rcfg, ecfg, presenter=sink, interactive=False, **kw), sink


def test_engine_runs_frames_and_publishes():
    engine, sink = _engine()
    engine.run(max_frames=5)
    assert len(sink.frames) == 5
    assert all(f.count(b"\n") == 24 for f in sink.frames)


def test_engine_animates_scene():
    engine, sink = _engine()
    c0 = np.asarray(engine.scene.spheres.center).copy()
    engine.run(max_frames=8)
    c1 = np.asarray(engine.scene.spheres.center)
    active = np.asarray(engine.scene.spheres.active) > 0.5
    # bobbing moved every active sphere's y
    assert (c0[active, 1] != c1[active, 1]).all()
    # x/z untouched
    np.testing.assert_array_equal(c0[active][:, [0, 2]], c1[active][:, [0, 2]])


def test_engine_spawn_grows_scene():
    engine, sink = _engine(spawn=True)
    engine.telemetry.interval = 0.0  # force the 1 Hz edge every frame
    n0 = engine.scene.n_spheres
    engine.run(max_frames=3)
    assert engine.scene.n_spheres > n0


def test_engine_autogrows_capacity_when_full():
    """Spawning past the pool doubles its capacity (the reference's
    ptr-array growth, Scene3D.cpp:107-129) and the loop keeps rendering."""
    rcfg = RenderConfig(width=40, height=24, max_spheres=6, max_planes=2)
    ecfg = EngineConfig(spawn=True, show_fps=False, seed=1, max_grow_spheres=24)
    sink = FramebufferSink(keep_all=True)
    engine = Engine(rcfg, ecfg, presenter=sink, interactive=False)
    engine.telemetry.interval = 0.0
    assert engine.scene.spheres.capacity == 6
    engine.run(max_frames=10)  # 5 seeded + 10 spawns = 15 live: two doublings
    assert engine.scene.spheres.capacity == 24
    assert engine.scene.n_spheres == 15
    assert len(sink.frames) == 10


def test_engine_autogrow_respects_cap():
    rcfg = RenderConfig(width=40, height=24, max_spheres=6, max_planes=2)
    ecfg = EngineConfig(spawn=True, show_fps=False, seed=1,
                        max_grow_spheres=6)  # cap at initial capacity
    engine = Engine(rcfg, ecfg, presenter=FramebufferSink(keep_all=True),
                    interactive=False)
    engine.telemetry.interval = 0.0
    engine.run(max_frames=6)
    assert engine.scene.spheres.capacity == 6  # silent refusal past the cap
    assert engine.scene.n_spheres == 6


def test_engine_stops_when_presenter_dies():
    engine, sink = _engine()
    engine.start()
    assert engine.run_frame()
    sink.cleanup()
    assert not engine.run_frame()
    engine.cleanup()


def test_cli_save_and_resume_scene(tmp_path, capsys):
    """python -m rtwc_tpu --save-scene / --scene round-trip (checkpoint/resume)."""
    from rtwc_tpu.engine.run import main
    from rtwc_tpu.scene import load_scene

    path = str(tmp_path / "ckpt.npz")
    base = ["--width", "32", "--height", "16", "--frames", "2",
            "--no-fps", "--no-spawn", "--n-spheres", "3"]
    assert main(base + ["--save-scene", path]) == 0
    scene, cam = load_scene(path)
    assert scene.n_spheres == 3 and cam is not None
    assert main(base + ["--scene", path]) == 0
    out = capsys.readouterr().out
    assert "\x1b[" in out  # frames actually reached the terminal


def test_engine_all_modes():
    for mode in (RenderMode.BIT_ASCII, RenderMode.BIT_PIXEL, RenderMode.RGB_ASCII,
                 RenderMode.RGB_PIXEL, RenderMode.RGB_NORMALS):
        engine, sink = _engine(mode=mode)
        engine.run(max_frames=2)
        assert sink.last, mode
