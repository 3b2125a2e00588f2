"""Asset-gated first-contact suite (VERDICT r3 #3): the same checks as
``python -m hands_tpu.cli.verify_setup``, as pytest items under the
``assets`` marker. Each test SKIPS cleanly when its licensed assets /
optional deps are absent (this environment has none of them), and becomes
a hard parity gate the moment $MANO_DIR / $SMPLX_DIR / $DATA_DIR /
smplx / pytorch3d appear:

    MANO_DIR=... pytest tests/test_first_contact.py -m assets
"""

import os

import pytest

from hands_tpu.cli import verify_setup as vs

assets = pytest.mark.assets


def _run(fn, *args):
    status, detail = fn(*args)
    if status == vs.SKIP:
        pytest.skip(detail)
    assert status == vs.PASS, detail


@assets
def test_mano_fk_vs_smplx():
    _run(vs.check_mano_fk)


@assets
def test_smplx_body_fk_vs_smplx():
    _run(vs.check_smplx_body_fk)


@assets
def test_rasterizer_vs_pytorch3d():
    _run(vs.check_rasterizer)


@assets
@pytest.mark.parametrize("family", vs.DATASET_FAMILIES)
def test_dataset_first_contact(family):
    if not os.environ.get("DATA_DIR"):
        pytest.skip("DATA_DIR not set")
    _run(vs.check_dataset, family)


def test_verify_setup_cli_runs_offline():
    """The CLI itself must run to completion (all SKIPs) with no assets —
    this is the only leg exercised in this environment."""
    results = vs.run_all(datasets=("arctic",), verbose=False)
    assert set(results) == {"mano_fk", "smplx_body_fk", "rasterizer",
                            "dataset:arctic"}
    assert all(s in (vs.SKIP, vs.PASS) for s, _ in results.values()), results
