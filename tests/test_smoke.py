"""Fast smoke subset (<1 min on the 1-core host): import surface, config
golden, split selection, one loader batch, rotation round-trip. Run with
``pytest tests/test_smoke.py -q`` when the full ~12 min suite is too slow
(e.g. driver pre-flight)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_import_surface():
    import hands_tpu.config
    import hands_tpu.core.camera
    import hands_tpu.core.rot
    import hands_tpu.core.transforms
    import hands_tpu.core.xdict
    import hands_tpu.data.datasets
    import hands_tpu.data.device_pipeline
    import hands_tpu.models.registry
    import hands_tpu.ops.mano
    import hands_tpu.ops.preprocess
    import hands_tpu.train.losses
    import hands_tpu.train.metrics
    import hands_tpu.train.step  # noqa: F401


def test_config_round_trip():
    from hands_tpu.config import available_methods, construct_args, \
        default_config

    assert set(available_methods()) == {
        "hands_light", "arctic_sf_light", "hamer_light", "handoccnet_light"}
    cfg = construct_args(["--method", "hands_light", "--debug"])
    assert cfg.debug and cfg.trainsplit == "minitrain"
    assert default_config("hamer_light").bbox_scale == 2.5


def test_downsample_reference_stream():
    import random

    from hands_tpu.data.dataset_utils import downsample

    names = [f"f{i}" for i in range(500)]
    random.seed(1)
    assert random.randint(0, 100) == 17
    assert downsample(names, "minival") == random.sample(names, 80)


def test_loader_one_batch():
    from hands_tpu.config import default_config
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DeviceDataLoader

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False)
    ds = SyntheticRecordDataset(cfg, "train", length=2, img_hw=(64, 96))
    dl = DeviceDataLoader(ds, cfg, batch_size=2, is_train=False, seed=0)
    inputs, targets, meta = next(iter(dl))
    assert inputs["img"].shape == (2, 224, 224, 3)
    assert inputs["r_bbox_og"].shape == (2, 4)
    assert np.isfinite(np.asarray(targets["mano.j2d.norm.r"])).all()


def test_bench_model_smoke():
    """bench.py's measurement path itself (the artifact the driver runs):
    build model + synthetic records + fused preprocess program and time a
    couple of iterations at a tiny batch. Guards the bench against bitrot
    between on-chip runs."""
    import bench

    v = bench.bench_model("hands_light", 2)
    assert np.isfinite(v) and v > 0


def test_rot_round_trip():
    from hands_tpu.core import rot

    aa = jnp.asarray(np.random.RandomState(0).randn(4, 3) * 0.5)
    R = rot.axis_angle_to_matrix(aa)
    back = rot.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-5)
