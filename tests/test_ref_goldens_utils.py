"""Golden parity for the small runtime utilities vs the reference's own
``common/{ld_utils,list_utils,np_utils,torch_utils}.py`` (all runnable with
the installed torch/numpy)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from hands_tpu.core import tree_utils as tu

pytestmark = pytest.mark.heavy


def test_ld2dl_and_unsort_match_reference():
    ld_ref = ref_compat.load("common.ld_utils")
    LD = [{"a": 1, "b": 2}, {"a": 3, "b": 4}, {"a": 5, "b": 6}]
    assert ld_ref.ld2dl(LD) == tu.ld2dl(LD)

    lst = ["x", "y", "z", "w"]
    sort_idx = [2, 0, 3, 1]
    ref_out = ld_ref.unsort(lst, sort_idx)
    assert ref_out == tu.unsort(lst, sort_idx)


def test_chunks_by_len_matches_reference():
    list_ref = ref_compat.load("common.list_utils")
    L = list(range(23))
    for n in (1, 4, 7, 23, 30):
        assert list(list_ref.chunks_by_len(L, n)) == list(tu.chunks_by_len(L, n))


def test_nanmean_matches_reference_torch():
    tu_ref = ref_compat.load("common.torch_utils")
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5).astype(np.float32)
    x[1, 2] = np.nan
    x[3] = np.nan
    ref = tu_ref.nanmean(torch.from_numpy(x.copy()), dim=1).numpy()
    ours = np.asarray(tu.nanmean(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, equal_nan=True)


def test_pad_unpad_match_reference_torch():
    tu_ref = ref_compat.load("common.torch_utils")
    rng = np.random.RandomState(1)
    arrs = [rng.randn(n, 3).astype(np.float32) for n in (5, 2, 7)]
    ref_padded, ref_len = tu_ref.pad_tensor_list(
        [torch.from_numpy(a) for a in arrs])
    padded, lengths = tu.pad_tensor_list(arrs)
    np.testing.assert_allclose(np.asarray(padded), ref_padded.numpy())
    np.testing.assert_array_equal(np.asarray(lengths), ref_len.numpy())

    ref_unpadded = tu_ref.unpad_vtensor(ref_padded, ref_len)
    ours = tu.unpad_vtensor(padded, lengths)
    for r, o in zip(ref_unpadded, ours):
        np.testing.assert_allclose(np.asarray(o), r.numpy())


def test_all_comb_matches_reference_torch():
    tu_ref = ref_compat.load("common.torch_utils")
    X = torch.arange(6).reshape(3, 2).float()
    Y = torch.arange(8).reshape(4, 2).float() + 10
    ref = tu_ref.all_comb(X, Y).numpy()
    ours = np.asarray(tu.all_comb(jnp.asarray(X.numpy()),
                                  jnp.asarray(Y.numpy())))
    np.testing.assert_allclose(ours, ref)


def test_permute_np_matches_reference():
    np_ref = ref_compat.load("common.np_utils")
    x = np.random.RandomState(2).rand(2, 3, 4)
    from hands_tpu.core.tree_utils import ld2dl  # noqa: F401 (import check)

    ref = np_ref.permute_np(x.copy(), (1, 2, 0))
    ours = np.moveaxis(x, (0, 1, 2), (1, 2, 0))
    np.testing.assert_allclose(ours, ref)


def test_downsample_matches_reference_selection():
    """The mini/tiny/small subset selection must be byte-identical to the
    reference's seeded random.sample (src/datasets/dataset_utils.py:187)."""
    ds_ref = ref_compat.load("src.datasets.dataset_utils")
    from hands_tpu.data.dataset_utils import downsample

    names = [f"img_{i:05d}.jpg" for i in range(2000)]
    # (splits whose quota exceeds the list length crash the reference's
    # unguarded random.sample; ours clamps — a deliberate robustness fix)
    for split in ("minitrain", "minival", "tinyval"):
        assert ds_ref.downsample(list(names), split) == \
            downsample(list(names), split), split
    big = [f"img_{i:05d}.jpg" for i in range(15000)]
    assert ds_ref.downsample(list(big), "smallval") == \
        downsample(list(big), "smallval")
    assert ds_ref.downsample(list(names), "train") == \
        downsample(list(names), "train")


def test_get_num_images_matches_reference():
    ds_ref = ref_compat.load("src.datasets.dataset_utils")
    from hands_tpu.data.dataset_utils import get_num_images

    for split in ("minitrain", "tinytrain", "smalltrain", "minival",
                  "tinyval", "smallval", "minitest", "tinytest", "smalltest",
                  "train", "val", "test"):
        assert get_num_images(split, 10 ** 9) == \
            ds_ref.get_num_images(split, 10 ** 9), split
