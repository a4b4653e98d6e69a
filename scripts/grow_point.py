#!/usr/bin/env python
"""Offline sparse-region point growing on a PLY cloud
(ref scripts/grow_point.py, minus the open3d dependency): duplicate points
in low-density regions with KNN-scaled jitter."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.data import ply
    from fourdgs_tpu.utils.point_grow import grow_points

    parser = argparse.ArgumentParser()
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--quantile", type=float, default=0.8)
    parser.add_argument("--displacement_scale", type=float, default=1.0)
    args = parser.parse_args()

    pts, cols, _ = ply.fetch_point_cloud(args.input)
    mask, new_xyz = grow_points(jax.random.key(0), jnp.asarray(pts),
                                args.displacement_scale,
                                quantile=args.quantile)
    mask = np.asarray(mask)
    merged = np.concatenate([pts, np.asarray(new_xyz)[mask]])
    merged_cols = np.concatenate([cols, cols[mask]])
    ply.store_point_cloud(args.output, merged, merged_cols * 255.0)
    print(f"{len(pts)} -> {len(merged)} points "
          f"(+{mask.sum()} in sparse regions)")


if __name__ == "__main__":
    main()
