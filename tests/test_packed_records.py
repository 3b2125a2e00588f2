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
