"""Trainer loop, checkpoint save/restore/resume, experiment logging."""

import json
import os

import jax
import numpy as np
import pytest

from hands_tpu.config import default_config
from hands_tpu.data.datasets import SyntheticRecordDataset
from hands_tpu.data.device_pipeline import DeviceDataLoader
from hands_tpu.models.registry import fetch_model
from hands_tpu.train.checkpoint import CheckpointManager
from hands_tpu.train.state import create_train_state
from hands_tpu.train.trainer import Trainer
from hands_tpu.utils.experiment import Experiment


def tiny_cfg(tmp_path, **kw):
    base = dict(
        backbone="resnet18", compute_dtype="float32", use_glb_feat=False,
        use_render_seg_loss=False, use_grasp_loss=False, batch_size=2,
        test_batch_size=2, eval_every_epoch=1, log_every=2,
        val_dataset="synthetic", dataset="synthetic", img_res=160, img_res_ds=160,
    )
    base.update(kw)
    return default_config("hands_light", **base)


@pytest.fixture
def loaders(tmp_path):
    cfg = tiny_cfg(tmp_path)
    train_ds = SyntheticRecordDataset(cfg, "train", length=4)
    val_ds = SyntheticRecordDataset(cfg, "val", length=2)
    train_loader = DeviceDataLoader(train_ds, cfg, 2, is_train=True)
    val_loader = DeviceDataLoader(val_ds, cfg, 2, is_train=False,
                                  drop_last=False)
    return cfg, train_loader, val_loader


def test_fit_one_epoch_checkpoints_and_logs(loaders, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg, train_loader, val_loader = loaders
    model = fetch_model(cfg)
    exp = Experiment(cfg, root=str(tmp_path / "logs"))
    trainer = Trainer(cfg, model, exp)
    state = trainer.fit(train_loader, val_loader, num_epochs=1)
    assert int(state.step) == 2  # 4 samples / bs 2
    assert trainer.ckpt.has_checkpoint("last")
    # top-k checkpoint written with loss__val score
    scores = json.load(open(os.path.join(trainer.ckpt.ckpt_dir, "scores.json")))
    assert len(scores) == 1
    # metrics jsonl written
    lines = open(os.path.join(exp.dir, "metrics.jsonl")).read().strip().split("\n")
    assert any("loss__val" in ln for ln in lines)
    assert os.path.exists(os.path.join(exp.dir, "args.json"))


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg(tmp_path)
    model = fetch_model(cfg)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    loader = DeviceDataLoader(ds, cfg, 2, is_train=False)
    inputs, _, meta = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), inputs, __import__("hands_tpu.core.xdict", fromlist=["device_view"]).device_view(meta))
    state = create_train_state(cfg, variables)

    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    ckpt.save_last(state, epoch=3)

    # perturb, then restore
    zeroed = state.replace(
        params=jax.tree.map(lambda x: x * 0, state.params))
    restored, epoch = ckpt.restore(zeroed, "last")
    assert epoch == 3
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0))


def test_checkpoint_topk_eviction(tmp_path):
    cfg = tiny_cfg(tmp_path)
    model = fetch_model(cfg)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    loader = DeviceDataLoader(ds, cfg, 2, is_train=False)
    inputs, _, meta = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), inputs, __import__("hands_tpu.core.xdict", fromlist=["device_view"]).device_view(meta))
    state = create_train_state(cfg, variables)

    ckpt = CheckpointManager(str(tmp_path / "ck"), top_k=2)
    for epoch, score in [(0, 5.0), (1, 3.0), (2, 4.0), (3, 1.0)]:
        ckpt.save_top_k(state, epoch, score)
    scores = json.load(open(str(tmp_path / "ck" / "scores.json")))
    # best-2 = epochs 3 (1.0) and 1 (3.0)
    assert set(scores) == {"epoch_0003", "epoch_0001"}
    assert os.path.exists(str(tmp_path / "ck" / "epoch_0003"))
    assert not os.path.exists(str(tmp_path / "ck" / "epoch_0000"))


def test_resume_continues_from_epoch(loaders, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg, train_loader, val_loader = loaders
    model = fetch_model(cfg)
    exp = Experiment(cfg, root=str(tmp_path / "logs2"))
    trainer = Trainer(cfg, model, exp)
    trainer.fit(train_loader, None, num_epochs=1)

    # resume: same ckpt dir, 2 total epochs -> one more epoch of steps
    cfg2 = cfg.replace(resume_ckpt=os.path.join(trainer.ckpt.ckpt_dir, "last"))
    trainer2 = Trainer(cfg2, model, exp)
    trainer2.ckpt = trainer.ckpt
    state = trainer2.fit(train_loader, None, num_epochs=2)
    assert int(state.step) == 4  # 2 epochs x 2 steps, not 6


def test_mid_epoch_checkpointing(loaders, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg, train_loader, _ = loaders
    cfg = cfg.replace(save_every_steps=1)
    model = fetch_model(cfg)
    exp = Experiment(cfg, root=str(tmp_path / "logs3"))
    trainer = Trainer(cfg, model, exp)
    # interrupt-free single epoch still writes 'last' during the epoch
    trainer.fit(train_loader, None, num_epochs=1)
    assert trainer.ckpt.has_checkpoint("last")


def test_prefetch_loader_delegates_trainer_interface():
    """The production path (num_workers>0) wraps the loader in
    PrefetchLoader; Trainer.fit drives peek()/set_epoch() on it."""
    from hands_tpu.config import default_config
    from hands_tpu.data.factory import fetch_dataloader
    from hands_tpu.data.device_pipeline import PrefetchLoader

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=False, use_grasp_loss=False, use_render_seg_loss=False,
        dataset="synthetic", trainsplit="tinytrain", batch_size=2,
        num_workers=2,
    )
    loader = fetch_dataloader(cfg, "train")
    assert isinstance(loader, PrefetchLoader)
    first = loader.peek()  # must not consume the first epoch's batch
    loader.set_epoch(0)
    n = 0
    for batch in loader:
        if n == 0:
            # peek returned the same first batch the epoch then yields
            import numpy as np

            np.testing.assert_allclose(
                np.asarray(batch[0]["img"]), np.asarray(first[0]["img"]))
        n += 1
    assert n == len(loader)
