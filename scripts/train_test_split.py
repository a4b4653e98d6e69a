#!/usr/bin/env python
"""Write transforms_{train,test}.json for a monocular capture with per-frame
times (ref scripts/train_test_split.py behavior: alternate/holdout split
over a transforms.json)."""
from __future__ import annotations

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("transforms", help="input transforms.json")
    parser.add_argument("--holdout", type=int, default=8,
                        help="every k-th frame goes to test")
    args = parser.parse_args()

    with open(args.transforms) as f:
        data = json.load(f)
    frames = data["frames"]
    n = len(frames)
    for i, fr in enumerate(frames):
        fr.setdefault("time", i / max(n - 1, 1))
    train = [fr for i, fr in enumerate(frames) if i % args.holdout != 0]
    test = [fr for i, fr in enumerate(frames) if i % args.holdout == 0]
    root = os.path.dirname(os.path.abspath(args.transforms))
    for name, split in (("train", train), ("test", test)):
        out = dict(data)
        out["frames"] = split
        with open(os.path.join(root, f"transforms_{name}.json"), "w") as f:
            json.dump(out, f, indent=2)
    print(f"{len(train)} train / {len(test)} test frames written")


if __name__ == "__main__":
    main()
