"""Offline packer: any registered dataset -> memory-mapped record shards.

Decode-free steady state (VERDICT r2 #2): run once per dataset/split, then
train with ``--packed_dir`` (or construct ``PackedRecordDataset`` directly)
and the input loop never touches a JPEG again — the TPU conclusion of the
reference's "speedup" pre-cropped images
(``src/datasets/hands_light_dataset.py:92``).

Usage:
  python -m hands_tpu.cli.pack_records --method hands_light \\
      --dataset hands --split train --out /data/packed/hands_train
  python -m hands_tpu.cli.pack_records --synthetic 256 --out /tmp/packed
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="hands_light")
    p.add_argument("--dataset", default="",
                   help="dataset registry name (e.g. hands, assembly, epic)")
    p.add_argument("--split", default="train")
    p.add_argument("--out", required=True)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--synthetic", type=int, default=0,
                   help="pack N synthetic records instead of a real dataset")
    args = p.parse_args(argv)

    from hands_tpu.config import default_config
    from hands_tpu.data.packed import pack_dataset

    cfg = default_config(args.method)
    if args.synthetic:
        from hands_tpu.data.datasets import SyntheticRecordDataset

        ds = SyntheticRecordDataset(cfg, args.split, length=args.synthetic)
    else:
        from hands_tpu.data.datasets import fetch_dataset

        name = args.dataset or cfg.dataset
        ds = fetch_dataset(cfg, name, args.split)

    t0 = time.time()
    out = pack_dataset(ds, args.out, chunk=args.chunk)
    dt = time.time() - t0
    size = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))
    print(json.dumps({
        "packed": out, "n": len(ds), "seconds": round(dt, 1),
        "bytes": size, "records_per_sec": round(len(ds) / max(dt, 1e-9), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
