"""Golden parity: contact-window mining + motion deviation vs the
reference's own ``src/utils/mdev.py`` (torch, runnable as-is)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat
from hands_tpu.train import metrics_object as mo

pytestmark = pytest.mark.heavy


def _make_sequence(T=60, V=40, Vo=24, seed=0):
    """Contact patterns exercising every branch: a clean long window, a
    too-short window, a sliding-contact window (matched object vertices far
    apart), split windows with a gap, and a run reaching the final frame."""
    rng = np.random.RandomState(seed)
    dist = np.full((T, V), 0.1, np.float32)
    dist_idx = rng.randint(0, Vo, size=(T, V)).astype(np.int64)
    # canonical object: two tight clusters far apart
    vo = np.concatenate([
        rng.rand(Vo // 2, 3) * 1e-4,
        rng.rand(Vo - Vo // 2, 3) * 1e-4 + 0.5,
    ]).astype(np.float32)

    dist[5:40, 3] = 0.0  # clean 35-frame window on vertex 3
    dist_idx[5:40, 3] = rng.randint(0, Vo // 2, size=35)  # one cluster
    dist[10:18, 7] = 0.0  # too short for window_thres=15
    dist[2:30, 11] = 0.0  # sliding: matches span both clusters
    dist_idx[2:30, 11] = rng.randint(0, Vo, size=28)
    dist[1:20, 13] = 0.0  # window A on vertex 13...
    dist[25:52, 13] = 0.0  # ...gap... window B
    dist_idx[1:20, 13] = 2
    dist_idx[25:52, 13] = np.where(rng.rand(27) < 0.4, 1, 4)  # mode test
    dist[30:, 17] = 0.0  # reaches the final frame: never closed
    return dist, dist_idx, vo


@pytest.mark.parametrize("seed", [0, 3])
def test_find_windows_matches_reference(seed):
    ref = ref_compat.load("src.utils.mdev")
    dist, dist_idx, vo = _make_sequence(seed=seed)
    contact_thres, window_thres = 3e-3, 15

    ref_windows = ref.find_windows(
        torch.from_numpy(dist), torch.from_numpy(dist_idx),
        torch.from_numpy(vo), contact_thres, window_thres)
    ours = mo.find_contact_windows(dist, dist_idx, vo, contact_thres,
                                   window_thres)
    assert sorted(map(tuple, ref_windows)) == sorted(map(tuple, ours))
    assert len(ours) >= 2  # the fixture must actually mine something


def test_compute_mdev_matches_reference():
    ref = ref_compat.load("src.utils.mdev")
    dist, dist_idx, vo = _make_sequence()
    windows = mo.find_contact_windows(dist, dist_idx, vo, 3e-3, 15)
    T, V = dist.shape
    rng = np.random.RandomState(1)
    vh = np.cumsum(rng.randn(T, V, 3).astype(np.float32) * 0.01, axis=0)
    vobj = np.cumsum(rng.randn(T, vo.shape[0], 3).astype(np.float32) * 0.01,
                     axis=0)
    frame_valid = (rng.rand(T) > 0.2).astype(np.float32)

    ref_list = ref.compute_mdev(
        windows.tolist(), torch.from_numpy(vh), torch.from_numpy(vobj),
        torch.from_numpy(frame_valid))
    ref_vals = np.asarray([float(x) for x in ref_list])
    ours = mo.compute_mdev_windows(windows, vh, vobj, frame_valid)
    np.testing.assert_allclose(ours, ref_vals, rtol=1e-5, atol=1e-7)
