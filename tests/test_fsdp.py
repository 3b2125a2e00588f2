"""FSDP (ZeRO-3) sharding: spec rules, numeric parity with the replicated
train step, and the memory diagnostic (params + Adam moments sharded).

The reference scales with DDP only (replicated params + grad all-reduce,
scripts_method/train.py:61-72); FSDP is the TPU-native memory-bound mode
(parallel/fsdp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from hands_tpu.config import default_config
from hands_tpu.parallel.fsdp import (fsdp_shardings, fsdp_spec, shard_bytes,
                                     shard_train_state)
from hands_tpu.parallel.mesh import make_mesh, shard_batch
from hands_tpu.train.state import create_train_state
from hands_tpu.train.step import make_train_step


def test_fsdp_spec_rules(devices):
    mesh = make_mesh((8,), ("data",), devices=devices)
    # scalar / small -> replicated
    assert fsdp_spec((), mesh) == P()
    assert fsdp_spec((128,), mesh) == P()
    # large divisible matrix -> largest dim sharded
    assert fsdp_spec((512, 2048), mesh) == P(None, "data")
    assert fsdp_spec((4096, 1024), mesh) == P("data", None)
    # indivisible -> replicated
    assert fsdp_spec((513, 1023), mesh) == P()
    # scan-stacked rank-3 (leading depth axis): avoid dim 0 when a feature
    # axis divides, even if depth is divisible
    assert fsdp_spec((32, 640, 2560), mesh) == P(None, None, "data")
    # tie prefers trailing dim
    assert fsdp_spec((2048, 2048), mesh) == P(None, "data")


def test_fsdp_train_step_matches_replicated(devices):
    """One full hands_light train step with FSDP-sharded TrainState on a
    2-device mesh == the single-device step (loss + updated params).
    2 devices = fewest collective rendezvous points (the virtual CPU
    backend deadlocks flakily at wider backward meshes, see
    test_sharding_tp.py)."""
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        batch_size=2, img_res=160, img_res_ds=160,
        use_render_seg_loss=False, use_grasp_loss=False,
    )
    batch = make_batch(cfg, batch_size=2, seed=0, np_arrays=True)
    model = HandsLightModel(cfg)
    inputs, _, meta = batch
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)

    # single-device reference step
    state_ref = create_train_state(cfg, variables)
    step_ref = make_train_step(model, cfg, donate=False)
    new_ref, logs_ref = step_ref(state_ref, batch, jax.random.PRNGKey(1))

    # FSDP: shard state + batch over a 2-device mesh, same jitted step
    mesh = make_mesh((2,), ("data",), devices=devices[:2])
    # drop the min-size floor so the tiny test model actually shards
    import hands_tpu.parallel.fsdp as fsdp_mod
    state = create_train_state(cfg, variables)
    state = jax.device_put(
        state, fsdp_shardings(state, mesh, min_shard_elems=1))
    batch_sh = shard_batch(batch, mesh)
    step = make_train_step(model, cfg, donate=False)
    with mesh:
        new_fsdp, logs = step(state, batch_sh, jax.random.PRNGKey(1))

    assert np.isfinite(float(logs["loss"]))
    np.testing.assert_allclose(
        float(logs["loss"]), float(logs_ref["loss"]), rtol=1e-5)
    # updated params match the replicated run
    la = jax.tree.leaves(new_ref.params)
    lb = jax.tree.leaves(new_fsdp.params)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
    _ = fsdp_mod


def test_fsdp_grad_accumulation_matches_replicated(devices):
    """FSDP x optax.MultiSteps (cfg.acc_grad=2): the accumulator tree is
    params-shaped so the shape-rule shardings cover it; the update must be
    held until the 2nd micro-step and match the replicated run."""
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        batch_size=2, img_res=160, img_res_ds=160, acc_grad=2,
        use_render_seg_loss=False, use_grasp_loss=False,
    )
    batch = make_batch(cfg, batch_size=2, seed=0, np_arrays=True)
    model = HandsLightModel(cfg)
    inputs, _, meta = batch
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)

    def two_micro_steps(state, step):
        s1, _ = step(state, batch, jax.random.PRNGKey(1))
        s2, logs = step(s1, batch, jax.random.PRNGKey(2))
        return s1, s2, logs

    state_ref = create_train_state(cfg, variables)
    step_ref = make_train_step(model, cfg, donate=False)
    _, ref2, _ = two_micro_steps(state_ref, step_ref)

    mesh = make_mesh((2,), ("data",), devices=devices[:2])
    state = create_train_state(cfg, variables)
    state = jax.device_put(
        state, fsdp_shardings(state, mesh, min_shard_elems=1))
    step = make_train_step(model, cfg, donate=False)
    with mesh:
        s1, s2, logs = two_micro_steps(state, step)

    assert np.isfinite(float(logs["loss"]))
    p0 = jax.tree.leaves(state.params)[0]
    # micro-step 1 holds the update; micro-step 2 applies it
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(s1.params)[0]),
                                  np.asarray(p0))
    assert np.abs(np.asarray(jax.tree.leaves(s2.params)[0])
                  - np.asarray(p0)).max() > 0
    for a, b in zip(jax.tree.leaves(ref2.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_trainer_fsdp_fit(tmp_path, monkeypatch, devices):
    """Trainer with Config.fsdp=True: one epoch end-to-end (sharded state,
    sharded batches, eval epoch, checkpointing of sharded arrays)."""
    monkeypatch.chdir(tmp_path)
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DeviceDataLoader
    from hands_tpu.models.registry import fetch_model
    from hands_tpu.train.trainer import Trainer
    from hands_tpu.utils.experiment import Experiment

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=False, use_render_seg_loss=False, use_grasp_loss=False,
        batch_size=2, test_batch_size=2, eval_every_epoch=1, log_every=2,
        val_dataset="synthetic", dataset="synthetic",
        img_res=160, img_res_ds=160,
        fsdp=True, mesh_shape=(2,), no_vis=True,
    )
    train_ds = SyntheticRecordDataset(cfg, "train", length=4)
    val_ds = SyntheticRecordDataset(cfg, "val", length=2)
    train_loader = DeviceDataLoader(train_ds, cfg, 2, is_train=True)
    val_loader = DeviceDataLoader(val_ds, cfg, 2, is_train=False,
                                  drop_last=False)
    model = fetch_model(cfg)
    exp = Experiment(cfg, root=str(tmp_path / "logs"))
    trainer = Trainer(cfg, model, exp)
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 2
    state = trainer.fit(train_loader, val_loader, num_epochs=1)
    assert int(state.step) == 2
    # params ended the run actually sharded over the mesh
    from jax.sharding import NamedSharding
    big = [l for l in jax.tree.leaves(state.params) if l.size >= 2 ** 14]
    assert big and any(
        isinstance(l.sharding, NamedSharding)
        and "data" in jax.tree.leaves(tuple(l.sharding.spec))
        for l in big)
    assert trainer.ckpt.has_checkpoint("last")


def test_fsdp_vith_memory_sharding(devices):
    """The scan-stacked ViT param tree shards: every large kernel (and its
    Adam moments) is split 8-way; per-device bytes ~= total/8."""
    from hands_tpu.models.backbones.vit import ViTBackbone

    mesh = make_mesh((8,), ("data",), devices=devices)
    vit = ViTBackbone(variant="tiny", dtype=jnp.float32, use_scan=True)
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)

    cfg = default_config("hamer_light", compute_dtype="float32")
    state = create_train_state(cfg, variables)
    state_sh = shard_train_state(state, mesh)

    # the scan-stacked MLP kernel: depth axis NOT sharded, feature axis is
    mlp_k = state_sh.params["blocks"]["block"]["mlp"]["Dense_0"]["kernel"]
    assert mlp_k.sharding.spec[0] is None
    assert "data" in tuple(mlp_k.sharding.spec)
    shard0 = mlp_k.addressable_shards[0].data
    assert shard0.size == mlp_k.size // 8

    # Adam mu mirrors the param sharding (shape-driven rule)
    mu = jax.tree.leaves(
        state_sh.opt_state, is_leaf=lambda n: hasattr(n, "mu"))
    adam = [n for n in jax.tree.leaves(
        state_sh.opt_state, is_leaf=lambda n: hasattr(n, "mu"))
        if hasattr(n, "mu")]
    assert adam, "adam state not found in opt_state"
    mu_k = adam[0].mu["blocks"]["block"]["mlp"]["Dense_0"]["kernel"]
    assert mu_k.sharding == mlp_k.sharding
    _ = mu

    # total per-device footprint shrinks by ~the kernel fraction
    total = sum(l.size * l.dtype.itemsize
                for l in jax.tree.leaves(state_sh.params))
    per_dev = shard_bytes(state_sh.params)
    assert per_dev < 0.4 * total, (per_dev, total)


def test_fsdp_checkpoint_roundtrip(tmp_path, devices):
    """Orbax save/restore of an FSDP-sharded TrainState: save from sharded
    arrays, restore into a sharded template — resume keeps working in the
    multi-chip memory-bound mode."""
    from hands_tpu.models.backbones.vit import ViTBackbone
    from hands_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh((8,), ("data",), devices=devices)
    vit = ViTBackbone(variant="tiny", dtype=jnp.float32, use_scan=True)
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(3), x)
    cfg = default_config("hamer_light", compute_dtype="float32")
    state = shard_train_state(create_train_state(cfg, variables), mesh)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_last(state, epoch=5)

    # restore into a freshly-initialised sharded template
    fresh = shard_train_state(
        create_train_state(cfg, vit.init(jax.random.PRNGKey(9), x)), mesh)
    restored, epoch = mgr.restore(fresh, "last")
    assert epoch == 5
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x0, x1 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    # restored leaves keep the FSDP sharding of the template
    mlp_k = restored.params["blocks"]["block"]["mlp"]["Dense_0"]["kernel"]
    assert "data" in tuple(mlp_k.sharding.spec)
