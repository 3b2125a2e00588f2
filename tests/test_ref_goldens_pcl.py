"""Golden parity: the PCL (PerspectiveCropLayers) virtual-camera crop vs
the reference's own code. The reference defines the PCL functions as
closures inside ``hands_light_dataset.__getitem__``
(hands_light_dataset.py:354-467), so the test extracts and executes those
exact source blocks rather than re-deriving the math."""

import math
import re
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.heavy

REF = "/root/reference/src/datasets/hands_light_dataset.py"


def _load_ref_pcl():
    """Extract + exec the reference's PCL closures in an isolated ns."""
    src = open(REF).read()
    ns = {"math": math, "np": np, "torch": torch,
          "F": torch.nn.functional}
    for name in ("virtualCameraRotationFromPosition", "bK_virt",
                 "perspective_grid"):
        m = re.search(
            rf"^([ \t]*)def {name}\(.*?(?=^\1def |^\1r_c = )",
            src, re.S | re.M)
        assert m, f"could not extract reference {name}"
        exec(textwrap.dedent(m.group(0)), ns)
    return ns


def _smooth_image(H, W):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.stack([
        0.5 + 0.5 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
        0.5 + 0.5 * np.cos(xx / 31.0 + 1.0),
        (xx + yy) / (H + W),
    ], axis=-1).astype(np.float32)
    return img


@pytest.mark.parametrize("case", [
    dict(c=(130.0, 100.0), size=96),   # off-centre hand
    dict(c=(50.0, 180.0), size=64),    # corner, strong slant
])
def test_pcl_crop_matches_reference(case):
    ns = _load_ref_pcl()
    res = 224
    K = np.asarray([[800.0, 0, 112.0], [0, 780.0, 118.0], [0, 0, 1]],
                   np.float32)
    img = _smooth_image(res, res)
    cx, cy = case["c"]
    size = case["size"]
    bbox = np.asarray([cx - size / 2, cy - size / 2,
                       cx + size / 2, cy + size / 2], np.float32)

    # reference composition (hands_light_dataset.py:433-466)
    pos = np.linalg.inv(K) @ np.array([cx, cy, 1.0])
    R_ref = ns["virtualCameraRotationFromPosition"](pos)
    K_virt = ns["bK_virt"](pos, K.copy(), [size, size])
    P = K @ R_ref @ np.linalg.inv(K_virt)
    grid = ns["perspective_grid"](
        torch.from_numpy(P).float(), res, [size, size],
        transform_to_pytorch=True)
    img_t = torch.from_numpy(img.transpose(2, 0, 1))
    n_img = torch.nn.functional.grid_sample(
        img_t[None], grid[None], align_corners=False)
    ref_crop = torch.nn.functional.interpolate(
        n_img, size=(res, res), mode="bilinear",
        align_corners=True)[0].numpy().transpose(1, 2, 0)

    from hands_tpu.ops import preprocess as pp

    crops, R_mine = pp.pcl_crop(
        jnp.asarray(img)[None], jnp.asarray(bbox)[None],
        jnp.asarray(K)[None], res)
    np.testing.assert_allclose(np.asarray(R_mine)[0], R_ref, atol=1e-5)

    mine = np.asarray(crops)[0]
    # single-warp-at-res vs the reference's size-res warp + AC resize:
    # identical sampling lattice, different interpolation composition —
    # compare the interior loosely, mean error tightly
    interior = (slice(4, -4), slice(4, -4))
    diff = np.abs(mine[interior] - ref_crop[interior])
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.99) < 0.05, np.quantile(diff, 0.99)
