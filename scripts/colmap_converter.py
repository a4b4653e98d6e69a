#!/usr/bin/env python
"""Read / write / convert COLMAP sparse models between .bin and .txt.

CLI-compatible with ref scripts/colmap_converter.py:450-469 (same flags,
same summary output); the format machinery lives in
fourdgs_tpu/data/colmap.py (full-fidelity records: point ids and
observation tracks survive the round trip).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fourdgs_tpu.data.colmap import read_model, write_model


def main():
    parser = argparse.ArgumentParser(
        description="Read and write COLMAP binary and text models")
    parser.add_argument("--input_model", help="path to input model folder")
    parser.add_argument("--input_format", choices=[".bin", ".txt"],
                        help="input model format", default="")
    parser.add_argument("--output_model", help="path to output model folder")
    parser.add_argument("--output_format", choices=[".bin", ".txt"],
                        help="outut model format", default=".txt")
    args = parser.parse_args()

    cameras, images, points3d = read_model(path=args.input_model,
                                           ext=args.input_format)
    print("num_cameras:", len(cameras))
    print("num_images:", len(images))
    print("num_points3D:", len(points3d))
    if args.output_model is not None:
        write_model(cameras, images, points3d, path=args.output_model,
                    ext=args.output_format)


if __name__ == "__main__":
    main()
