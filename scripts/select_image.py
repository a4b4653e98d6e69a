#!/usr/bin/env python
"""Assemble a training-progress video from saved per-iteration renders.

Counterpart of ref scripts/select_image.py (which hardcodes one scene's
frame schedule): picks coarse/fine render frames on a configurable
iteration schedule, maps each to a ping-pong timestamp sweep, and writes
an mp4. Frame files follow the training visualizer's naming
({iteration}_{time_stamp}.jpg under {coarse,fine}_render/images)."""
import argparse
import os
import sys


def pingpong(index: int, times: int) -> int:
    """Sweep timestamps 0..times-1 then back (ref select_image.py:18-22)."""
    return (index % times if (index // times) % 2 == 0
            else times - 1 - (index % times))


def schedule(spec: str) -> list[int]:
    """'start:stop:step[,start:stop:step...]' -> iteration list."""
    out = []
    for part in spec.split(","):
        a, b, s = (int(x) for x in part.split(":"))
        out.extend(range(a, b, s))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_path", help="render root (contains coarse_render/"
                   "and fine_render/images)")
    p.add_argument("--times", type=int, required=True,
                   help="number of timestamps in the sweep")
    p.add_argument("--coarse", default="50:500:50",
                   help="coarse iteration schedule start:stop:step[,...]")
    p.add_argument("--fine", default="10:1000:10,1000:20000:200",
                   help="fine iteration schedule")
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--out", default="trainingstep.mp4")
    args = p.parse_args()

    import imageio
    coarse = [os.path.join(args.data_path, "coarse_render", "images",
                           f"{f}_{pingpong(i, args.times)}.jpg")
              for i, f in enumerate(schedule(args.coarse))]
    off = len(coarse)
    fine = [os.path.join(args.data_path, "fine_render", "images",
                         f"{f}_{pingpong(off + i, args.times)}.jpg")
            for i, f in enumerate(schedule(args.fine))]
    out_path = os.path.join(args.data_path, args.out)
    writer = imageio.get_writer(out_path, fps=args.fps)
    missing = 0
    for path in coarse + fine:
        if not os.path.exists(path):
            missing += 1
            continue
        writer.append_data(imageio.imread(path))
    writer.close()
    print(f"wrote {out_path} ({len(coarse) + len(fine) - missing} frames, "
          f"{missing} missing)")


if __name__ == "__main__":
    main()
