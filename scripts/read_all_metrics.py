#!/usr/bin/env python
"""Aggregate per-scene results.json across a benchmark suite
(ref scripts/read_all_metrics.py:14-38)."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", help="output dir containing scene subdirs")
    parser.add_argument("--method", default=None,
                        help="method key (default: first found)")
    args = parser.parse_args()

    agg: dict[str, list] = {}
    scenes = []
    for name in sorted(os.listdir(args.root)):
        p = os.path.join(args.root, name, "results.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            results = json.load(f)
        method = args.method or sorted(results)[-1]
        if method not in results:
            continue
        scenes.append(name)
        for k, v in results[method].items():
            agg.setdefault(k, []).append(v)
    if not scenes:
        print("no results.json found")
        return
    print(f"scenes ({len(scenes)}): {', '.join(scenes)}")
    for k, vals in agg.items():
        print(f"{k:10s} mean={np.mean(vals):.5f}  "
              + " ".join(f"{v:.4f}" for v in vals))


if __name__ == "__main__":
    main()
