#!/usr/bin/env python
"""Voxel-downsample a dense point cloud to a training init budget
(ref scripts/downsample_point.py:9-14, which targets <40k points via
open3d voxel_down_sample; here a numpy voxel-grid mean, no open3d)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def voxel_downsample(points: np.ndarray, colors: np.ndarray,
                     voxel_size: float):
    """Mean position/color per occupied voxel."""
    keys = np.floor(points / voxel_size).astype(np.int64)
    # hash voxel coords
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    n_vox = counts.shape[0]
    pts = np.zeros((n_vox, 3))
    cols = np.zeros((n_vox, 3))
    np.add.at(pts, inv, points)
    np.add.at(cols, inv, colors)
    pts /= counts[:, None]
    cols /= counts[:, None]
    return pts.astype(np.float32), cols.astype(np.float32)


def downsample_to_budget(points, colors, budget: int = 40_000,
                         tol: float = 0.1, max_iter: int = 20):
    """Binary-search the voxel size to land under `budget` points."""
    if len(points) <= budget:
        return points, colors
    extent = points.max(0) - points.min(0)
    lo, hi = 1e-6, float(np.max(extent))
    best = None
    for _ in range(max_iter):
        mid = (lo + hi) / 2
        p, c = voxel_downsample(points, colors, mid)
        if len(p) > budget:
            lo = mid
        else:
            best = (p, c)
            hi = mid
            if len(p) > budget * (1 - tol):
                break
    return best if best is not None else voxel_downsample(points, colors, hi)


def main():
    from fourdgs_tpu.data import ply

    parser = argparse.ArgumentParser()
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--budget", type=int, default=40_000)
    parser.add_argument("--voxel_size", type=float, default=None)
    args = parser.parse_args()

    pts, cols, _ = ply.fetch_point_cloud(args.input)
    if args.voxel_size:
        p, c = voxel_downsample(pts, cols, args.voxel_size)
    else:
        p, c = downsample_to_budget(pts, cols, args.budget)
    print(f"{len(pts)} -> {len(p)} points")
    ply.store_point_cloud(args.output, p, c * 255.0)


if __name__ == "__main__":
    main()
