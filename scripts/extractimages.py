#!/usr/bin/env python
"""Extract frames from videos into per-camera image directories
(ref scripts/extractimages.py behavior; used when preparing MultipleView
captures: camNN.mp4 -> camNN/frame_XXXXX.jpg)."""
from __future__ import annotations

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("videos_dir")
    parser.add_argument("--out", default=None)
    parser.add_argument("--every", type=int, default=1)
    args = parser.parse_args()

    import cv2

    out_root = args.out or args.videos_dir
    for i, video in enumerate(sorted(
            glob.glob(os.path.join(args.videos_dir, "*.mp4")))):
        cam_dir = os.path.join(out_root, f"cam{i+1:02d}")
        os.makedirs(cam_dir, exist_ok=True)
        cap = cv2.VideoCapture(video)
        n, saved = 0, 0
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            if n % args.every == 0:
                saved += 1
                cv2.imwrite(os.path.join(cam_dir,
                                         f"frame_{saved:05d}.jpg"), frame)
            n += 1
        cap.release()
        print(f"{video}: {saved} frames -> {cam_dir}")


if __name__ == "__main__":
    main()
