"""Pack per-sequence extracted features into one split-level file with
imgname verification (reference ``scripts_method/build_feat_split.py:23-35``)."""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def check_imgname_match(imgnames_feat, split_imgnames):
    """Set equality of (suffix-normalised) image names — guards against
    packing features from the wrong split (reference :23)."""
    norm = lambda n: "/".join(n.split("/")[-4:])  # noqa: E731
    feat = {norm(n) for n in imgnames_feat}
    ref = {norm(n) for n in split_imgnames}
    assert feat == ref, (
        f"imgname mismatch: {len(feat - ref)} extra, {len(ref - feat)} missing"
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--eval_p", required=True,
                   help="dir of per-seq extraction npy files")
    p.add_argument("--split_npy", default="",
                   help="optional split npy for imgname verification")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.eval_p, "*.npy")))
    assert files, f"no extraction files under {args.eval_p}"
    imgnames, feats = [], {}
    for f in files:
        data = np.load(f, allow_pickle=True).item()
        imgnames.extend(data["imgname"])
        for k, v in data.items():
            if k.startswith("pred."):
                feats.setdefault(k, []).append(v)

    if args.split_npy:
        split = np.load(args.split_npy, allow_pickle=True).item()
        check_imgname_match(imgnames, split["imgnames"])
        print("Passed verification")

    out_p = args.out or os.path.join(args.eval_p, "packed_split.npy")
    payload = {"imgname": imgnames}
    for k, v in feats.items():
        payload[k] = np.concatenate(v, axis=0)
    np.save(out_p, payload)
    print(f"packed {len(imgnames)} samples -> {out_p}")
    return out_p


if __name__ == "__main__":
    main(sys.argv[1:])
