#!/usr/bin/env python
"""Dump HexPlane grid weights as images (the reference ships a
weight_visualization.ipynb; this is the CLI equivalent): per level/plane,
the feature L2 norm over the plane, normalized to [0,255]."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from PIL import Image

    from fourdgs_tpu.train import checkpoint

    snap, it = checkpoint.find_latest_snapshot(args.model_path,
                                               args.iteration)
    _, dflat, _ = checkpoint.load_snapshot(snap)
    out_dir = args.out or os.path.join(args.model_path,
                                       f"hexplane_vis_{it}")
    os.makedirs(out_dir, exist_ok=True)
    names = ["xy", "xz", "xt", "yz", "yt", "zt"]
    for key, arr in sorted(dflat.items()):
        if not key.startswith("grid/"):
            continue
        tag = key.split("/")[-1]            # l{level}_p{ci}
        ci = int(tag.split("_p")[1])
        norm = np.linalg.norm(np.asarray(arr), axis=-1)
        lo, hi = norm.min(), norm.max()
        img = ((norm - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(out_dir, f"{tag}_{names[ci]}.png"))
        print(f"{tag} ({names[ci]}): shape={arr.shape} "
              f"norm range [{lo:.3f}, {hi:.3f}]")
    print(f"wrote plane visualizations to {out_dir}")


if __name__ == "__main__":
    main()
