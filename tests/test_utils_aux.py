"""Aux utils: profiling timer, viewer, sys utils, experiment logging."""

import os

import numpy as np


def test_step_timer():
    import time

    from hands_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["steps"] == 3
    assert 5 < s["mean_ms"] < 100


def test_step_trace(tmp_path):
    """StepTrace captures exactly the [skip, skip+steps) window and writes
    a profiler trace dir (the --profile_steps Trainer hookup)."""
    import jax
    import jax.numpy as jnp

    from hands_tpu.utils.profiling import StepTrace

    log_dir = str(tmp_path / "trace")
    tr = StepTrace(log_dir, steps=2, skip=1)
    f = jax.jit(lambda x: (x * 2).sum())
    for i in range(5):
        tr.update(i)
        float(f(jnp.ones(32)))
        assert tr._on == (1 <= i < 3)
    tr.close()
    found = []
    for root, _, files in os.walk(log_dir):
        found += files
    assert any(f.endswith(".xplane.pb") or "trace" in f for f in found), found

    # steps=0 -> strict no-op, no dir created
    tr0 = StepTrace(str(tmp_path / "none"), steps=0)
    for i in range(3):
        tr0.update(i)
    tr0.close()
    assert not os.path.exists(str(tmp_path / "none"))


def test_viewer_gif_and_strip(tmp_path):
    from hands_tpu.utils.viewer import render_sequence, save_gif, save_strip

    T, H, W = 3, 64, 64
    images = np.zeros((T, H, W, 3), np.float32)
    verts = np.asarray(
        [[[-0.03, -0.03, 0.5], [0.03, -0.03, 0.5], [0.0, 0.03, 0.5]]] * T,
        np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    K = np.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    frames = render_sequence(images, [verts], [faces], K, sideview=True)
    assert frames.shape == (T, H, 2 * W, 3)
    gif = save_gif(frames, str(tmp_path / "seq.gif"))
    strip = save_strip(frames, str(tmp_path / "strip.png"))
    assert os.path.getsize(gif) > 0 and os.path.getsize(strip) > 0


def test_experiment_rank0_gating(tmp_path, monkeypatch):
    """Under multi-host only rank 0 writes logs (Lightning rank_zero_only
    convention); non-zero ranks still get dirs/paths for the collective
    checkpoint saves."""
    import jax

    from hands_tpu.config import default_config
    from hands_tpu.utils import experiment as exp_mod

    cfg = default_config("hands_light", exp_key="rankgate1")
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    e = exp_mod.Experiment(cfg, root=str(tmp_path))
    e.log_dict({"loss": 1.0}, step=1)
    e.close()
    assert os.path.isdir(e.ckpt_dir)  # paths exist for collective saves
    assert not os.path.exists(os.path.join(e.dir, "metrics.jsonl"))
    assert not os.path.exists(os.path.join(e.dir, "args.json"))

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    e0 = exp_mod.Experiment(cfg.replace(exp_key="rankgate0"),
                            root=str(tmp_path))
    e0.log_dict({"loss": 1.0}, step=1)
    e0.close()
    assert os.path.exists(os.path.join(e0.dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(e0.dir, "args.json"))


def test_sys_utils(tmp_path):
    from hands_tpu.utils.sys_utils import copy_repo, mkdir, reset_all_seeds

    d = mkdir(str(tmp_path / "a/b"))
    assert os.path.isdir(d)
    src = tmp_path / "src"
    os.makedirs(src / "logs")
    (src / "x.py").write_text("pass")
    (src / "logs" / "junk.txt").write_text("no")
    copy_repo(str(src), str(tmp_path / "dst"))
    assert os.path.exists(tmp_path / "dst" / "x.py")
    assert not os.path.exists(tmp_path / "dst" / "logs")
    reset_all_seeds(3)
    a = np.random.rand()
    reset_all_seeds(3)
    assert np.random.rand() == a


def test_mesh_cat_and_export(tmp_path):
    from hands_tpu.core.mesh import Mesh

    m1 = Mesh(np.zeros((3, 3)), np.asarray([[0, 1, 2]])).set_vc([1, 0, 0])
    m2 = Mesh(np.ones((3, 3)), np.asarray([[0, 1, 2]]))
    cat = Mesh.cat([m1, m2])
    assert cat.v.shape == (6, 3)
    assert (cat.f[1] == [3, 4, 5]).all()
    p = cat.export_obj(str(tmp_path / "m.obj"))
    assert "v 0.0 0.0 0.0" in open(p).read()


def test_thing_conversions():
    import jax.numpy as jnp

    from hands_tpu.core import thing

    nest = {"a": jnp.ones(3), "b": [np.zeros(2), 5], "c": (jnp.ones(1),)}
    as_np = thing.thing2np(nest)
    assert isinstance(as_np["a"], np.ndarray)
    as_list = thing.thing2list(as_np)
    assert as_list["a"] == [1.0, 1.0, 1.0]
    back = thing.thing2jax(as_np)
    assert isinstance(back["a"], jnp.ndarray)
