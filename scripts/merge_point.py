#!/usr/bin/env python
"""Merge several point-cloud PLYs into one (ref scripts/merge_point.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from fourdgs_tpu.data import ply

    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()
    pts, cols = [], []
    for p in args.inputs:
        x, c, _ = ply.fetch_point_cloud(p)
        pts.append(x)
        cols.append(c)
    xyz = np.concatenate(pts)
    rgb = np.concatenate(cols)
    ply.store_point_cloud(args.output, xyz, rgb * 255.0)
    print(f"merged {len(args.inputs)} clouds -> {len(xyz)} points")


if __name__ == "__main__":
    main()
