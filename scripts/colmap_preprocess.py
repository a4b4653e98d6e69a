#!/usr/bin/env python
"""COLMAP preprocessing pipeline wrapper: known-pose triangulation + image
undistortion for multi-view captures (the python equivalent of ref
colmap.sh:13-24 + multipleviewprogress.sh + database.py's intrinsics
injection). Requires the `colmap` binary on PATH; every step degrades to a
clear error when it is missing."""
from __future__ import annotations

import argparse
import os
import shutil
import sqlite3
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def require_colmap():
    if shutil.which("colmap") is None:
        raise SystemExit(
            "the `colmap` binary is required for pose/point preprocessing; "
            "install COLMAP or provide poses in one of the supported "
            "formats (Blender/D-NeRF json, poses_bounds.npy, Nerfies json)")


def run(cmd: list[str]):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def inject_intrinsics(database_path: str, cameras: dict):
    """Write known camera intrinsics into the COLMAP SQLite DB
    (ref database.py's COLMAPDatabase usage in multipleviewprogress.sh)."""
    db = sqlite3.connect(database_path)
    try:
        for cam_id, (model_id, width, height, params) in cameras.items():
            blob = np.asarray(params, np.float64).tobytes()
            db.execute(
                "UPDATE cameras SET model=?, width=?, height=?, params=?, "
                "prior_focal_length=1 WHERE camera_id=?",
                (model_id, width, height, blob, cam_id))
        db.commit()
    finally:
        db.close()


def sparse_reconstruct(source: str, image_dir: str = "images"):
    """Feature extraction -> matching -> mapping (colmap.sh equivalent)."""
    require_colmap()
    db = os.path.join(source, "database.db")
    sparse = os.path.join(source, "sparse")
    os.makedirs(sparse, exist_ok=True)
    run(["colmap", "feature_extractor", "--database_path", db,
         "--image_path", os.path.join(source, image_dir),
         "--ImageReader.camera_model", "PINHOLE",
         "--ImageReader.single_camera", "1"])
    run(["colmap", "exhaustive_matcher", "--database_path", db])
    run(["colmap", "mapper", "--database_path", db,
         "--image_path", os.path.join(source, image_dir),
         "--output_path", sparse])


def triangulate_known_poses(source: str, pose_sparse: str,
                            image_dir: str = "images"):
    """Point triangulation with fixed known poses + dense fusion
    (ref colmap.sh:13-24)."""
    require_colmap()
    db = os.path.join(source, "database.db")
    out = os.path.join(source, "sparse", "0")
    os.makedirs(out, exist_ok=True)
    run(["colmap", "point_triangulator", "--database_path", db,
         "--image_path", os.path.join(source, image_dir),
         "--input_path", pose_sparse, "--output_path", out])
    dense = os.path.join(source, "dense")
    os.makedirs(dense, exist_ok=True)
    run(["colmap", "image_undistorter", "--image_path",
         os.path.join(source, image_dir), "--input_path", out,
         "--output_path", dense])
    run(["colmap", "patch_match_stereo", "--workspace_path", dense])
    run(["colmap", "stereo_fusion", "--workspace_path", dense,
         "--output_path", os.path.join(dense, "fused.ply")])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("source")
    parser.add_argument("--mode", choices=["sparse", "triangulate"],
                        default="sparse")
    parser.add_argument("--pose_sparse", default=None)
    parser.add_argument("--images", default="images")
    args = parser.parse_args()
    if args.mode == "sparse":
        sparse_reconstruct(args.source, args.images)
    else:
        triangulate_known_poses(args.source, args.pose_sparse, args.images)


if __name__ == "__main__":
    main()
