#!/usr/bin/env python
"""Pre-extract DyNeRF video frames to cached image dirs
(ref scripts/preprocess_dynerf.py): run once before training so the first
training launch does no video decoding."""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from fourdgs_tpu.data.dynerf import IMG_WH, extract_video_frames

    parser = argparse.ArgumentParser(
        description="Extract images from dynerf videos")
    parser.add_argument("--datadir", required=True)
    args = parser.parse_args()
    for video in sorted(glob.glob(os.path.join(args.datadir, "cam*.mp4"))):
        d = extract_video_frames(video, IMG_WH)
        print(f"{video} -> {d} ({len(os.listdir(d))} frames)")


if __name__ == "__main__":
    main()
