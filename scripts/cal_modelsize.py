#!/usr/bin/env python
"""Report model storage size: point_cloud.ply + deformation.npz per scene,
averaged across scenes (ref scripts/cal_modelsize.py:1-25)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from fourdgs_tpu.train.checkpoint import find_latest_snapshot

    parser = argparse.ArgumentParser()
    parser.add_argument("model_paths", nargs="+")
    args = parser.parse_args()
    sizes = []
    for mp in args.model_paths:
        snap, it = find_latest_snapshot(mp)
        total = 0
        for name in ("point_cloud.ply", "deformation.npz"):
            p = os.path.join(snap, name)
            if os.path.exists(p):
                total += os.path.getsize(p)
        mb = total / 1e6
        sizes.append(mb)
        print(f"{mp} (iter {it}): {mb:.2f} MB")
    if sizes:
        print(f"mean: {sum(sizes)/len(sizes):.2f} MB over {len(sizes)} scenes")


if __name__ == "__main__":
    main()
