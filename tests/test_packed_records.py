"""Packed-record shards (data/packed.py): round-trip parity with the live
dataset, loader equivalence through both the Record view and the
stacked_batch fast path, and the pack CLI."""

import numpy as np
import pytest

from hands_tpu.config import default_config
from hands_tpu.data.datasets import SyntheticRecordDataset
from hands_tpu.data.device_pipeline import DeviceDataLoader, stack_records
from hands_tpu.data.packed import PackedRecordDataset, pack_dataset


@pytest.fixture(scope="module")
def cfg():
    return default_config(
        "hands_light", backbone="resnet18", use_render_seg_loss=True,
        img_res=128, img_res_ds=128)


@pytest.fixture(scope="module")
def packed(cfg, tmp_path_factory):
    ds = SyntheticRecordDataset(cfg, "train", length=10)
    out = tmp_path_factory.mktemp("packed")
    pack_dataset(ds, str(out), chunk=4)  # chunk < n exercises multi-chunk
    return ds, PackedRecordDataset(str(out))


def _assert_stacked_equal(a, b):
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], list):
            assert a[k] == b[k], k
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_roundtrip_stack_equality(packed):
    """packer -> loader == direct dataset, bit-exact, both access paths."""
    ds, pds = packed
    assert len(pds) == len(ds)
    idxs = [3, 0, 7, 9]
    direct = stack_records([ds[i] for i in idxs])
    via_records = stack_records([pds[i] for i in idxs])
    via_fast = pds.stacked_batch(idxs)
    _assert_stacked_equal(direct, via_records)
    _assert_stacked_equal(direct, via_fast)


def test_record_view_fields(packed):
    ds, pds = packed
    r0, p0 = ds[2], pds[2]
    assert p0.imgname == r0.imgname
    assert p0.image.dtype == np.uint8
    assert type(p0.use_gt_k) is type(r0.use_gt_k)
    assert (p0.r_bbox is None) == (r0.r_bbox is None)
    assert p0.loss_flags == r0.loss_flags


def test_loader_equivalence_end_to_end(cfg, packed):
    """DeviceDataLoader over the packed dataset (fast path) produces the
    same device batches as over the live dataset — same shuffle, same
    augmentation stream, same padding of the tail batch."""
    ds, pds = packed
    kw = dict(cfg=cfg, batch_size=4, is_train=True, seed=3, num_workers=0,
              drop_last=False)
    live = DeviceDataLoader(ds, **kw)
    fast = DeviceDataLoader(pds, **kw)
    batches_live = list(live)
    batches_fast = list(fast)
    assert len(batches_live) == len(batches_fast) == 3  # 10 -> 4+4+2pad
    for (i1, t1, m1), (i2, t2, m2) in zip(batches_live, batches_fast):
        assert m1["imgname"] == m2["imgname"]
        assert m1["num_valid"] == m2["num_valid"]
        for k in i1:
            np.testing.assert_array_equal(
                np.asarray(i1[k]), np.asarray(i2[k]), err_msg=f"inputs.{k}")
        for k in t1:
            np.testing.assert_array_equal(
                np.asarray(t1[k]), np.asarray(t2[k]), err_msg=f"targets.{k}")


def test_downscale_record_geometry(cfg):
    """Pack-time downscale (packed.downscale_record): pixel-space fields
    scale together so the normalised crop geometry is invariant, the image
    is area-averaged, masks keep their value coding, and patch-space
    quantities are untouched."""
    from hands_tpu.data.packed import downscale_record

    ds = SyntheticRecordDataset(cfg, "train", length=2)
    ref = ds[0]
    rec = ds[0]
    k = 2
    out = downscale_record(rec, k)

    H, W = ref.image.shape[:2]
    assert out.image.shape == (H // k, W // k, 3)
    # area-average (with rounding) of the top-left cell
    cell = ref.image[:k, :k].astype(np.uint32).sum((0, 1))
    np.testing.assert_array_equal(out.image[0, 0],
                                  ((cell + k * k // 2) // (k * k)))
    # normalised rays through K are invariant: inv(K') @ [x', y', 1]
    # == inv(K) @ [x, y, 1] for every scaled 2D joint
    for name in ("j2d_r", "j2d_l"):
        j_ref = np.asarray(getattr(ref, name), np.float32)
        j_out = np.asarray(getattr(out, name), np.float32)
        np.testing.assert_allclose(j_out[:, :2], j_ref[:, :2] / k, rtol=1e-6)
        np.testing.assert_array_equal(j_out[:, 2], j_ref[:, 2])
        h_ref = np.concatenate([j_ref[:, :2], np.ones((21, 1))], 1)
        h_out = np.concatenate([j_out[:, :2], np.ones((21, 1))], 1)
        rays_ref = h_ref @ np.linalg.inv(np.asarray(ref.K)).T
        rays_out = h_out @ np.linalg.inv(np.asarray(out.K)).T
        np.testing.assert_allclose(rays_out, rays_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.bbox),
                               np.asarray(ref.bbox, np.float32) / k)
    if ref.mask is not None:
        assert out.mask.shape == (H // k, W // k)
        assert set(np.unique(out.mask)) <= set(np.unique(ref.mask))
    # patch-space / non-pixel fields untouched
    assert out.wp_focal == ref.wp_focal
    np.testing.assert_array_equal(np.asarray(out.pose_r),
                                  np.asarray(ref.pose_r))
    # k=1 is the identity
    same = downscale_record(ds[1], 1)
    np.testing.assert_array_equal(same.image, ds[1].image)


def test_pack_downscale_roundtrip(cfg, tmp_path):
    """pack_dataset(downscale=k) == pack(downscale_record(rec, k)) for every
    row, and meta.json records the factor."""
    import json as _json
    import os.path as _op

    from hands_tpu.data.packed import downscale_record

    ds = SyntheticRecordDataset(cfg, "train", length=6)
    out = str(tmp_path / "ds2")
    pack_dataset(ds, out, chunk=4, downscale=2)
    meta = _json.load(open(_op.join(out, "meta.json")))
    assert meta["downscale"] == 2
    pds = PackedRecordDataset(out)
    direct = stack_records([downscale_record(ds[i], 2) for i in range(6)])
    _assert_stacked_equal(direct, pds.stacked_batch(range(6)))


def test_pack_cli(tmp_path, capsys):
    from hands_tpu.cli.pack_records import main

    rc = main(["--synthetic", "6", "--out", str(tmp_path / "p"),
               "--method", "hands_light"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 6
    pds = PackedRecordDataset(str(tmp_path / "p"))
    assert len(pds) == 6
