"""First-contact verification against real licensed assets (VERDICT r3 #3).

Everything in this repo that touches MANO/SMPL-X numerics or dataset
layouts is built to the reference's exact contracts
(``/root/reference/common/body_models.py:90-92`` for MANO construction,
``renderer.py:157`` for the silhouette shader,
``src/datasets/hands_light_dataset.py:542-551`` for the on-disk layout),
but the licensed assets and dataset downloads cannot ship with the code.
This CLI turns "should match" into a turnkey check the first time real
assets are present:

    MANO_DIR=.../mano_v1_2/models \
    SMPLX_DIR=.../smplx/models \
    DATA_DIR=.../data \
    python -m hands_tpu.cli.verify_setup

Checks (each runs iff its deps/assets are present, else SKIP):
  mano_fk        our pure-JAX MANO FK vs the smplx package on the real
                 pkls: vertices + joints < 1e-5 m, both hands
  smplx_body_fk  ops/smplx_body vs smplx.SMPLX on the real npz
  rasterizer     ops/rasterizer vs pytorch3d SoftSilhouetteShader
  dataset:<name> real dataset walk: build the loader on the actual
                 download, read a batch end-to-end

Exit code: 0 if nothing FAILED (SKIPs are fine), 1 otherwise. The same
checks run under pytest as ``-m assets`` (tests/test_first_contact.py).
"""

from __future__ import annotations

import argparse
import os
import traceback

import numpy as np

PASS, SKIP, FAIL = "PASS", "SKIP", "FAIL"


def _have_smplx():
    try:
        import smplx  # noqa: F401

        return True
    except Exception:
        return False


def _have_pytorch3d():
    try:
        from pytorch3d import renderer  # noqa: F401

        return True
    except Exception:
        return False


def mano_assets_present():
    d = os.environ.get("MANO_DIR", "")
    return bool(d) and all(
        os.path.exists(os.path.join(d, f"MANO_{s}.pkl"))
        for s in ("RIGHT", "LEFT"))


def smplx_assets_present():
    d = os.environ.get("SMPLX_DIR", "")
    return bool(d) and os.path.exists(os.path.join(d, "SMPLX_NEUTRAL.npz"))


def check_mano_fk(tol: float = 1e-5, batch: int = 8):
    """Our FK vs smplx on the licensed pkls — the <1e-3 parity contract's
    root dependency (reference common/body_models.py:90-97: MANO(dir,
    is_rhand, use_pca=False, flat_hand_mean=...))."""
    if not mano_assets_present():
        return SKIP, "MANO_DIR not set / pkls absent"
    if not _have_smplx():
        return SKIP, "smplx package not installed"
    import jax.numpy as jnp
    import smplx
    import torch

    from hands_tpu.ops import mano as manolib

    rng = np.random.RandomState(0)
    betas = rng.randn(batch, 10).astype(np.float32) * 0.5
    pose = rng.randn(batch, 45).astype(np.float32) * 0.4
    orient = rng.randn(batch, 3).astype(np.float32) * 0.5

    worst = 0.0
    for is_rhand in (True, False):
        ours = manolib.mano_forward(
            manolib.load_mano(is_rhand, flat_hand_mean=False),
            jnp.asarray(betas), jnp.asarray(pose), jnp.asarray(orient))
        ref = smplx.MANO(
            os.environ["MANO_DIR"], is_rhand=is_rhand, use_pca=False,
            flat_hand_mean=False, batch_size=batch)
        with torch.no_grad():
            out = ref(betas=torch.from_numpy(betas),
                      hand_pose=torch.from_numpy(pose),
                      global_orient=torch.from_numpy(orient))
        dv = float(np.abs(np.asarray(ours.vertices)
                          - out.vertices.numpy()).max())
        nj = min(np.asarray(ours.joints).shape[1],
                 out.joints.numpy().shape[1])
        dj = float(np.abs(np.asarray(ours.joints)[:, :nj]
                          - out.joints.numpy()[:, :nj]).max())
        worst = max(worst, dv, dj)
        side = "right" if is_rhand else "left"
        if max(dv, dj) > tol:
            return FAIL, (f"{side}: verts {dv:.2e} joints({nj}) {dj:.2e} "
                          f"> {tol:.0e}")
    return PASS, f"both hands verts+joints < {worst:.2e} (tol {tol:.0e})"


def check_smplx_body_fk(tol: float = 1e-5, batch: int = 4):
    """ops/smplx_body (ARCTIC GT build FK) vs smplx.SMPLX on the real npz
    (reference processing.py:192-205 param bundle)."""
    if not smplx_assets_present():
        return SKIP, "SMPLX_DIR not set / npz absent"
    if not _have_smplx():
        return SKIP, "smplx package not installed"
    import jax.numpy as jnp
    import smplx
    import torch

    from hands_tpu.ops import smplx_body

    rng = np.random.RandomState(0)
    kw = {
        "global_orient": rng.randn(batch, 3).astype(np.float32) * 0.3,
        "body_pose": rng.randn(batch, 63).astype(np.float32) * 0.2,
        "jaw_pose": rng.randn(batch, 3).astype(np.float32) * 0.1,
        "leye_pose": rng.randn(batch, 3).astype(np.float32) * 0.1,
        "reye_pose": rng.randn(batch, 3).astype(np.float32) * 0.1,
        "left_hand_pose": rng.randn(batch, 45).astype(np.float32) * 0.3,
        "right_hand_pose": rng.randn(batch, 45).astype(np.float32) * 0.3,
        "transl": rng.randn(batch, 3).astype(np.float32) * 0.5,
        "betas": rng.randn(batch, 10).astype(np.float32) * 0.5,
    }
    model = smplx_body.load_body_model("neutral", use_pca=False,
                                       flat_hand_mean=True)
    ours = smplx_body.body_forward(
        model, **{k: jnp.asarray(v) for k, v in kw.items()})
    ref = smplx.SMPLX(
        os.environ["SMPLX_DIR"], gender="neutral", use_pca=False,
        flat_hand_mean=True, batch_size=batch)
    with torch.no_grad():
        out = ref(**{k: torch.from_numpy(v) for k, v in kw.items()})
    dv = float(np.abs(np.asarray(ours.vertices)
                      - out.vertices.numpy()).max())
    nj = min(np.asarray(ours.joints).shape[1], out.joints.numpy().shape[1])
    dj = float(np.abs(np.asarray(ours.joints)[:, :nj]
                      - out.joints.numpy()[:, :nj]).max())
    if max(dv, dj) > tol:
        return FAIL, f"verts {dv:.2e} joints({nj}) {dj:.2e} > {tol:.0e}"
    return PASS, f"verts {dv:.2e} joints({nj}) {dj:.2e} (tol {tol:.0e})"


def check_rasterizer(batch: int = 2, res: int = 64):
    """ops/rasterizer soft silhouette vs pytorch3d SoftSilhouetteShader
    (reference src/models/hands_light/renderer.py:157-208: blur_radius
    1e-4*... / sigma from the same formula, faces_per_pixel cap)."""
    if not _have_pytorch3d():
        return SKIP, "pytorch3d not installed"
    import jax.numpy as jnp
    import torch
    from pytorch3d.renderer import (BlendParams, MeshRasterizer,
                                    MeshRenderer, PerspectiveCameras,
                                    RasterizationSettings,
                                    SoftSilhouetteShader)
    from pytorch3d.structures import Meshes

    from hands_tpu.ops import mano as manolib
    from hands_tpu.ops.rasterizer import render_silhouette

    model = manolib.load_mano(True)
    rng = np.random.RandomState(0)
    betas = jnp.asarray(rng.randn(batch, 10) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.randn(batch, 45) * 0.2, jnp.float32)
    orient = jnp.zeros((batch, 3), jnp.float32)
    out = manolib.mano_forward(model, betas, pose, orient)
    verts = np.asarray(out.vertices) + np.array([0, 0, 0.5], np.float32)
    faces = np.asarray(model.faces)

    K = np.tile(np.asarray(
        [[5000.0 * res / 224, 0, res / 2],
         [0, 5000.0 * res / 224, res / 2], [0, 0, 1]], np.float32),
        (batch, 1, 1))
    ours = np.asarray(render_silhouette(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(K), res))

    sigma = 1e-4
    cameras = PerspectiveCameras(
        focal_length=torch.tensor([[K[0, 0, 0], K[0, 1, 1]]]).repeat(
            batch, 1),
        principal_point=torch.tensor([[K[0, 0, 2], K[0, 1, 2]]]).repeat(
            batch, 1),
        in_ndc=False, image_size=torch.tensor([[res, res]]).repeat(batch, 1))
    raster_settings = RasterizationSettings(
        image_size=res, blur_radius=np.log(1.0 / 1e-4 - 1.0) * sigma,
        faces_per_pixel=50)
    renderer = MeshRenderer(
        rasterizer=MeshRasterizer(cameras=cameras,
                                  raster_settings=raster_settings),
        shader=SoftSilhouetteShader(
            blend_params=BlendParams(sigma=sigma)))
    # pytorch3d cameras look down +z with x left / y up; flip x,y
    vt = torch.from_numpy(verts * np.array([-1, -1, 1], np.float32))
    meshes = Meshes(verts=[v for v in vt],
                    faces=[torch.from_numpy(faces.astype(np.int64))] * batch)
    ref = renderer(meshes)[..., 3].numpy()
    iou_num = np.minimum(ours, ref).sum()
    iou_den = np.maximum(ours, ref).sum() + 1e-9
    iou = float(iou_num / iou_den)
    if iou < 0.9:
        return FAIL, f"soft-silhouette IoU {iou:.3f} < 0.9"
    return PASS, f"soft-silhouette IoU {iou:.3f}"


def check_dataset(name: str, setup: str = "p2a"):
    """Build the real dataset from $DATA_DIR and pull one batch through
    the full device pipeline (layout contract, e.g.
    hands_light_dataset.py:542-551)."""
    if not os.environ.get("DATA_DIR"):
        return SKIP, "DATA_DIR not set"
    try:
        import jax

        from hands_tpu.config import default_config
        from hands_tpu.data.datasets import fetch_dataset
        from hands_tpu.data.device_pipeline import DeviceDataLoader

        cfg = default_config("hands_light", setup=setup,
                             use_render_seg_loss=False, num_workers=0)
        ds = fetch_dataset(cfg, name, "minival")
        n = len(ds)
        if n == 0:
            return FAIL, "dataset is empty"
        loader = DeviceDataLoader(ds, cfg, min(4, n), is_train=False,
                                  seed=0)
        inputs, targets, meta = next(iter(loader))
        img = np.asarray(inputs["img"] if "img" in inputs
                         else jax.tree.leaves(dict(inputs))[0])
        if not np.isfinite(img.astype(np.float32)).all():
            return FAIL, "non-finite batch values"
        return PASS, f"{n} samples, one batch through the device pipeline"
    except FileNotFoundError as e:
        return SKIP, f"download absent: {e}"
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        return FAIL, f"{type(e).__name__}: {e}"


DATASET_FAMILIES = ("arctic", "assembly", "epic", "h2o", "egoexo",
                    "epic_grasp", "ego_grasp", "epic_seg", "ego_seg",
                    "epic_depth")


def run_all(datasets=DATASET_FAMILIES, verbose: bool = True):
    results = {}
    checks = [("mano_fk", check_mano_fk),
              ("smplx_body_fk", check_smplx_body_fk),
              ("rasterizer", check_rasterizer)]
    checks += [(f"dataset:{d}", lambda d=d: check_dataset(d))
               for d in datasets]
    for name, fn in checks:
        try:
            status, detail = fn()
        except Exception as e:  # noqa: BLE001
            status, detail = FAIL, f"{type(e).__name__}: {e}"
            if verbose:
                traceback.print_exc()
        results[name] = (status, detail)
        if verbose:
            print(f"[{status}] {name:20s} {detail}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datasets", nargs="*", default=list(DATASET_FAMILIES))
    args = p.parse_args(argv)
    results = run_all(args.datasets)
    n_fail = sum(1 for s, _ in results.values() if s == FAIL)
    n_pass = sum(1 for s, _ in results.values() if s == PASS)
    print(f"{n_pass} passed, {n_fail} failed, "
          f"{len(results) - n_pass - n_fail} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
