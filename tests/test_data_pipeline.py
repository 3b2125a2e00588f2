"""Data layer: records, device pipeline, dataset registry, loaders."""

import jax
import numpy as np
import pytest

from hands_tpu.config import default_config
from hands_tpu.data import dataset_utils as du
from hands_tpu.data.datasets import (
    DATASET_REGISTRY, ConcatDataset, DataNotFoundError, SyntheticRecordDataset,
    fetch_dataset,
)
from hands_tpu.data.device_pipeline import DeviceDataLoader, DevicePreprocessor, stack_records


def cfg_small(**kw):
    base = dict(use_render_seg_loss=True, use_grasp_loss=True,
                compute_dtype="float32")
    base.update(kw)
    return default_config("hands_light", **base)


def test_downsample_deterministic():
    names = [f"f{i}" for i in range(1000)]
    a = du.downsample(names, "minitrain")
    b = du.downsample(names, "minitrain")
    assert a == b and len(a) == 300
    assert du.downsample(names, "train") == names
    assert len(du.downsample(names, "tinyval")) == 500
    # byte-identical subset selection to the reference (random.sample on the
    # seeded Mersenne stream, dataset_utils.py:187-199)
    import random
    random.seed(1)
    assert random.randint(0, 100) == 17
    assert du.downsample(names, "minitrain") == random.sample(names, 300)


def test_synthetic_records_consistent_geometry():
    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=4)
    rec = ds[0]
    # j2d must be the projection of j3d through K
    p = rec.j3d_r @ rec.K.T
    j2d = p[:, :2] / p[:, 2:]
    np.testing.assert_allclose(rec.j2d_r[:, :2], j2d, atol=1e-3)
    assert rec.image.shape == (320, 427, 3)
    assert rec.loss_flags["is_j2d_loss"] == 1.0
    assert rec.loss_flags["is_depth_loss"] == 0.0


def test_device_pipeline_shapes_and_consistency():
    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=4)
    stacked = stack_records([ds[i] for i in range(4)])
    pre = DevicePreprocessor(cfg, is_train=False)  # no augmentation
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))

    B, res = 4, cfg.img_res
    assert inputs["img"].shape == (B, res, res, 3)
    assert inputs["r_img"].shape == (B, cfg.img_res_ds, cfg.img_res_ds, 3)
    assert inputs["r_center_angle"].shape == (B, 2)
    assert inputs["r_corner_angle"].shape == (B, 8)
    assert targets["mano.j2d.norm.r"].shape == (B, 21, 3)
    assert meta["intrinsics"].shape == (B, 3, 3)
    for k, v in {**inputs, **targets, **meta}.items():
        if k == "dist":  # NaN by design for non-ego views (reference L:470)
            continue
        assert np.isfinite(np.asarray(v)).all(), k

    # eval mode: j2d in [-1,1]-ish range (hands near patch centre)
    j = np.asarray(targets["mano.j2d.norm.r"])[..., :2]
    assert np.abs(j).max() < 2.0


def test_device_pipeline_augmentation_consistency():
    """With rotation augmentation, the warped joint positions must still
    match projecting the rotated 3D joints with the patch intrinsics."""
    cfg = cfg_small(use_gt_k=True)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    stacked = stack_records([ds[0], ds[1]])
    pre = DevicePreprocessor(cfg, is_train=True)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(42))
    K = np.asarray(meta["intrinsics"])
    j3d = np.asarray(targets["mano.j3d.full.r"])
    p = np.einsum("bij,bnj->bni", K, j3d)
    j2d_proj = p[..., :2] / p[..., 2:]
    j2d_norm = 2 * j2d_proj / cfg.img_res - 1
    j2d_t = np.asarray(targets["mano.j2d.norm.r"])[..., :2]
    np.testing.assert_allclose(j2d_t, j2d_norm, atol=2e-2)


def test_loader_iterates():
    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=6)
    loader = DeviceDataLoader(ds, cfg, batch_size=2, is_train=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    inputs, targets, meta = batches[0]
    assert len(meta["imgname"]) == 2


def test_concat_dataset():
    cfg = cfg_small()
    a = SyntheticRecordDataset(cfg, "train", length=3)
    b = SyntheticRecordDataset(cfg, "train", length=2)
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert cat[4].imgname == b[1].imgname


def test_real_datasets_raise_without_data(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    cfg = cfg_small()
    for name in ["hands", "assembly", "epic", "epic_grasp", "epic_seg",
                 "epic_depth", "ego_grasp", "ego_seg", "h2o", "egoexo",
                 "sample"]:
        with pytest.raises(DataNotFoundError):
            DATASET_REGISTRY[name](cfg, "train")


def test_fetch_dataset_concat_syntax():
    cfg = cfg_small()
    ds = fetch_dataset(cfg, "synthetic+synthetic", "tinyval")
    assert len(ds) == 2 * len(SyntheticRecordDataset(cfg, "tinyval"))


def test_pipeline_feeds_model_end_to_end():
    """Loader batch -> model forward -> loss: full real-data-path chain."""
    from hands_tpu.models.hands_light import HandsLightModel
    from hands_tpu.train.losses import compute_loss_light, total_loss
    from hands_tpu.train.process import process_data_light

    cfg = cfg_small(backbone="resnet18", use_glb_feat=False,
                    use_render_seg_loss=False, use_grasp_loss=True)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    loader = DeviceDataLoader(ds, cfg, batch_size=2, is_train=True, seed=0)
    inputs, targets, meta = next(iter(loader))
    meta_dev = __import__("hands_tpu.core.xdict", fromlist=["device_view"]).device_view(meta)

    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_dev)
    _, targets, meta_dev = process_data_light(
        model.mano_r, model.mano_l, inputs, targets, meta_dev, cfg.img_res)
    pred = model(variables, inputs, meta_dev, train=False)
    ld = compute_loss_light(pred, targets, meta_dev, cfg)
    assert np.isfinite(float(total_loss(ld)))


def test_flip_augmentation_mirrors_and_swaps():
    """flip=1: pixels mirror, bboxes mirror AND swap sides, targets stay."""
    cfg = cfg_small(flip_prob=1.0)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    stacked = stack_records([ds[0], ds[1]])

    pre_on = DevicePreprocessor(cfg, is_train=True)
    pre_off = DevicePreprocessor(cfg.replace(flip_prob=0.0), is_train=True)
    key = jax.random.PRNGKey(7)
    i1, t1, m1 = pre_on(stacked, key)
    i0, t0, m0 = pre_off(stacked, key)

    assert np.asarray(m1["is_flipped"]).sum() == 2
    assert np.asarray(m0["is_flipped"]).sum() == 0
    # the full image is the horizontal mirror of the unflipped one
    np.testing.assert_allclose(
        np.asarray(i1["img"]), np.asarray(i0["img"])[:, :, ::-1, :], atol=1e-5)
    # r_bbox is the mirrored l_bbox
    res = cfg.img_res
    l0 = np.asarray(i0["l_bbox"])
    expect_r = np.stack(
        [res - 1 - l0[:, 2], l0[:, 1], res - 1 - l0[:, 0], l0[:, 3]], -1)
    np.testing.assert_allclose(np.asarray(i1["r_bbox"]), expect_r, atol=1e-4)
    # targets unchanged
    np.testing.assert_allclose(
        np.asarray(t1["mano.j2d.norm.r"]), np.asarray(t0["mano.j2d.norm.r"]),
        atol=1e-6)


def test_tail_batch_padded_to_fixed_shape():
    """drop_last=False: the tail batch pads to batch_size with invalidated
    samples (one compiled program for a whole eval sweep)."""
    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=5)
    loader = DeviceDataLoader(ds, cfg, batch_size=2, is_train=False,
                              drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    last_inputs, last_targets, last_meta = batches[-1]
    assert last_inputs["img"].shape[0] == 2  # padded to full size
    assert last_meta["num_valid"] == 1
    assert len(last_meta["imgname"]) == 1
    assert float(np.asarray(last_targets["is_valid"])[1]) == 0.0


def test_prefetch_loader_equivalent():
    from hands_tpu.data.device_pipeline import PrefetchLoader

    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=4)
    loader = DeviceDataLoader(ds, cfg, batch_size=2, is_train=False)
    direct = [np.asarray(b[0]["img"]) for b in loader]
    prefetched = [np.asarray(b[0]["img"]) for b in PrefetchLoader(loader)]
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        np.testing.assert_allclose(a, b)


def test_loader_determinism():
    """Same seed -> identical batches (images, targets, augmentation)."""
    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=4)
    l1 = DeviceDataLoader(ds, cfg, 2, is_train=True, seed=7)
    l2 = DeviceDataLoader(ds, cfg, 2, is_train=True, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(np.asarray(b1[0]["img"]),
                                  np.asarray(b2[0]["img"]))
    np.testing.assert_array_equal(np.asarray(b1[1]["mano.pose.r"]),
                                  np.asarray(b2[1]["mano.pose.r"]))
    # different seed -> different augmentation
    l3 = DeviceDataLoader(ds, cfg, 2, is_train=True, seed=8)
    b3 = next(iter(l3))
    assert not np.array_equal(np.asarray(b1[0]["img"]),
                              np.asarray(b3[0]["img"]))


def test_loader_epochs_vary_but_runs_reproduce():
    """Epoch 0 != epoch 1 (order AND augmentation draws advance), while two
    loaders with the same seed replay the same epoch sequence, and peek()
    does not consume the epoch (round-1 review weak #1/#7)."""
    cfg = cfg_small()
    ds = SyntheticRecordDataset(cfg, "train", length=8)
    l1 = DeviceDataLoader(ds, cfg, 4, is_train=True, seed=7)
    l2 = DeviceDataLoader(ds, cfg, 4, is_train=True, seed=7)

    peek = l1.peek()
    e0_1 = [b for b in l1]
    e1_1 = [b for b in l1]
    e0_2 = [b for b in l2]
    e1_2 = [b for b in l2]

    # peek == first batch of epoch 0 (not consumed)
    np.testing.assert_array_equal(np.asarray(peek[0]["img"]),
                                  np.asarray(e0_1[0][0]["img"]))
    # same run -> same epochs across loaders
    for ea, eb in ((e0_1, e0_2), (e1_1, e1_2)):
        for a, b in zip(ea, eb):
            np.testing.assert_array_equal(np.asarray(a[0]["img"]),
                                          np.asarray(b[0]["img"]))
    # epoch 0 != epoch 1: different sample order or augmentation
    diff = any(
        not np.array_equal(np.asarray(a[0]["img"]), np.asarray(b[0]["img"]))
        for a, b in zip(e0_1, e1_1))
    assert diff, "epoch 1 replayed epoch 0 exactly"
    # and the *order* itself reshuffles across epochs
    names0 = [tuple(b[2]["imgname"]) for b in e0_1]
    names1 = [tuple(b[2]["imgname"]) for b in e1_1]
    assert names0 != names1, "epoch shuffle did not advance"
    # set_epoch pins the stream
    l3 = DeviceDataLoader(ds, cfg, 4, is_train=True, seed=7)
    l3.set_epoch(1)
    e1_3 = [b for b in l3]
    for a, b in zip(e1_1, e1_3):
        np.testing.assert_array_equal(np.asarray(a[0]["img"]),
                                      np.asarray(b[0]["img"]))


def test_sinusoidal_cc_and_cam_conv_pipeline_modes():
    """sinusoidal_cc produces normalised-coordinate 'angles' (2c/res - 1,
    dataset:335-352); cam_conv produces the 6-channel dense encoding
    (rays + pixel offsets + centred coords, dataset:302-333); both mirror
    the encodings into targets center./corner.* for the optional
    regression heads."""
    import jax.numpy as jnp

    cfg = cfg_small().replace(pos_enc="sinusoidal_cc")
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    stacked = stack_records([ds[i] for i in range(2)])
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))

    res = cfg.img_res_ds
    bb = np.asarray(inputs["r_bbox"])
    expect_center = 2.0 * (bb[:, :2] + bb[:, 2:]) / 2.0 / res - 1.0
    np.testing.assert_allclose(np.asarray(inputs["r_center_angle"]),
                               expect_center, atol=1e-5)
    assert inputs["r_corner_angle"].shape == (2, 8)
    # coords live in [-1, 1] + margin; rays would be sub-radian values with
    # a different distribution — check the corner values reconstruct bbox
    corners = (np.asarray(inputs["r_corner_angle"]).reshape(2, 4, 2) + 1) \
        * res / 2.0
    np.testing.assert_allclose(corners[:, 0], bb[:, :2], atol=1e-4)
    np.testing.assert_allclose(corners[:, 3], bb[:, 2:], atol=1e-4)
    for k in ("center.r", "center.l", "corner.r", "corner.l"):
        assert k in targets

    cfg2 = cfg_small().replace(pos_enc="cam_conv")
    pre2 = DevicePreprocessor(cfg2, is_train=False)
    inputs2, targets2, _ = pre2(stacked, jax.random.PRNGKey(0))
    d = np.asarray(inputs2["r_dense_angle"])
    assert d.shape == (2, res, res, 6)
    K = np.asarray(inputs2["K"]) if "K" in inputs2 else np.asarray(
        _[0] if isinstance(_, tuple) else _["intrinsics"])
    # channel consistency: ch0 = arctan2(ch2, fx), ch4 = 2*gx/res - 1 where
    # gx = ch2 + cx
    fx = K[:, 0, 0][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    np.testing.assert_allclose(d[..., 0], np.arctan2(d[..., 2], fx),
                               atol=1e-5)
    np.testing.assert_allclose(
        d[..., 4], 2.0 * (d[..., 2] + cx) / res - 1.0, atol=1e-4)

    # e2e: the trunk consumes the cam_conv latent concat
    from hands_tpu.models.hands_light import HandsLightNet

    net = HandsLightNet(cfg2.replace(compute_dtype="float32"))
    variables = net.init(jax.random.PRNGKey(0), inputs2, train=False)
    out = net.apply(variables, inputs2, train=False)
    assert np.isfinite(np.asarray(out["hmr_r"]["pose"])).all()
