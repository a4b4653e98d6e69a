"""In-training visual debugging: gt / render / depth triptych images
(ref utils/scene_utils.py:11-57 render_training_image), written as JPEGs
with stage/iteration/time labels."""
from __future__ import annotations

import os

import numpy as np


def _colorize_depth(depth: np.ndarray) -> np.ndarray:
    d = np.asarray(depth, np.float32)
    lo, hi = np.percentile(d[d > 0], [2, 98]) if (d > 0).any() else (0, 1)
    norm = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    # simple viridis-ish ramp without matplotlib
    r = np.clip(1.5 * norm - 0.25, 0, 1)
    g = np.clip(1.5 * norm, 0, 1) * (1 - 0.3 * norm)
    b = np.clip(1.2 - 1.5 * norm, 0, 1)
    return np.stack([r, g, b], -1)


def render_training_image(out_dir: str, label: str, iteration: int,
                          elapsed_s: float, gt: np.ndarray,
                          render: np.ndarray, depth: np.ndarray,
                          time_value: float):
    from PIL import Image, ImageDraw

    gt = np.clip(np.asarray(gt), 0, 1)
    render = np.clip(np.asarray(render), 0, 1)
    trip = np.concatenate([gt, render, _colorize_depth(depth)], axis=1)
    img = Image.fromarray((trip * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    draw.text((10, 10),
              f"{label} it={iteration} t={elapsed_s:.0f}s time={time_value:.3f}",
              fill=(255, 255, 0))
    os.makedirs(out_dir, exist_ok=True)
    img.save(os.path.join(out_dir, f"{iteration:05d}.jpg"), quality=90)


def plot_camera_orientations(cam_list, xyz, out_path: str = "output.png",
                             threshold: float = 2.0):
    """3D scatter of the point cloud + camera viewing directions — the
    pose-convention debug plot of ref scene/dataset_readers.py:510-535.
    `cam_list` holds objects with .R (3,3) and .T (3,); xyz is (N, 3)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    m = np.all(np.abs(xyz) <= threshold, axis=1)
    pts = xyz[m]
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c="r", s=0.1)
    for cam in cam_list:
        R, T = np.asarray(cam.R), np.asarray(cam.T)
        d = R @ np.array([0.0, 0.0, 1.0])
        ax.quiver(T[0], T[1], T[2], d[0], d[1], d[2], length=1)
    ax.set_xlabel("X Axis")
    ax.set_ylabel("Y Axis")
    ax.set_zlabel("Z Axis")
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
