"""COLMAP sparse-reconstruction parsers (binary and text).

Implements the COLMAP file formats (cameras/images/points3D, .bin and .txt)
needed by the Colmap and MultipleView scene readers; behavioral contract via
ref scene/colmap_loader.py:43-282. Written against the published COLMAP
format layout: https://colmap.github.io/format.html.
"""
from __future__ import annotations

import os
import struct
from typing import NamedTuple

import numpy as np

# camera_model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: (mid, n) for mid, (name, n) in CAMERA_MODELS.items()}


class ColmapCamera(NamedTuple):
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


class ColmapImage(NamedTuple):
    id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str
    xys: np.ndarray
    point3D_ids: np.ndarray


def qvec2rotmat(qvec):
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y]])


def rotmat2qvec(R):
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz]]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def _read(f, n, fmt):
    return struct.unpack("<" + fmt, f.read(n))


def read_cameras_binary(path: str) -> dict[int, ColmapCamera]:
    cams = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            cid, model_id, w, h = _read(f, 24, "iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, 8 * n_params, "d" * n_params))
            cams[cid] = ColmapCamera(id=cid, model=name, width=int(w),
                                     height=int(h), params=params)
    return cams


def read_cameras_text(path: str) -> dict[int, ColmapCamera]:
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            cid = int(el[0])
            cams[cid] = ColmapCamera(
                id=cid, model=el[1], width=int(el[2]), height=int(el[3]),
                params=np.array(el[4:], dtype=np.float64))
    return cams


def read_images_binary(path: str) -> dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            props = _read(f, 64, "idddddddi")
            iid = props[0]
            qvec = np.array(props[1:5])
            tvec = np.array(props[5:8])
            camera_id = props[8]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (n_pts,) = _read(f, 8, "Q")
            data = _read(f, 24 * n_pts, "ddq" * n_pts)
            xys = np.column_stack([data[0::3], data[1::3]])
            p3d = np.array(data[2::3], dtype=np.int64)
            images[iid] = ColmapImage(id=iid, qvec=qvec, tvec=tvec,
                                      camera_id=camera_id,
                                      name=name.decode("utf-8"),
                                      xys=xys, point3D_ids=p3d)
    return images


def read_images_text(path: str) -> dict[int, ColmapImage]:
    images = {}
    with open(path) as f:
        lines = [ln.strip() for ln in f
                 if ln.strip() and not ln.startswith("#")]
    for i in range(0, len(lines), 2):
        el = lines[i].split()
        iid = int(el[0])
        qvec = np.array(el[1:5], dtype=np.float64)
        tvec = np.array(el[5:8], dtype=np.float64)
        el2 = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.column_stack([np.array(el2[0::3], np.float64),
                               np.array(el2[1::3], np.float64)]) \
            if el2 else np.zeros((0, 2))
        p3d = np.array(el2[2::3], dtype=np.int64) if el2 else np.zeros(0, np.int64)
        images[iid] = ColmapImage(id=iid, qvec=qvec, tvec=tvec,
                                  camera_id=int(el[8]), name=el[9],
                                  xys=xys, point3D_ids=p3d)
    return images


def read_points3d_binary(path: str):
    """Returns (xyz (N,3), rgb (N,3) uint8-valued, errors (N,)).

    Uses the native C++ parser when built (fourdgs_tpu/native; COLMAP's
    variable-length track records force a sequential walk that is slow in
    Python for million-point clouds), falling back to pure Python."""
    try:
        from fourdgs_tpu import native
        out = native.read_points3d_binary(path)
        if out is not None:
            return out
    except (ImportError, OSError):
        pass
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        xyz = np.empty((num, 3))
        rgb = np.empty((num, 3))
        err = np.empty(num)
        for i in range(num):
            props = _read(f, 43, "QdddBBBd")
            xyz[i] = props[1:4]
            rgb[i] = props[4:7]
            err[i] = props[7]
            (track_len,) = _read(f, 8, "Q")
            f.seek(8 * track_len, os.SEEK_CUR)
    return xyz, rgb, err


def read_points3d_text(path: str):
    xyzs, rgbs, errs = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            xyzs.append([float(x) for x in el[1:4]])
            rgbs.append([float(x) for x in el[4:7]])
            errs.append(float(el[7]))
    return np.array(xyzs), np.array(rgbs), np.array(errs)


def write_cameras_binary(cams: dict[int, ColmapCamera], path: str):
    """Round-trip support (used by tests and preprocessing tools)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam in cams.values():
            mid, n_params = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            f.write(struct.pack("<" + "d" * n_params, *cam.params[:n_params]))


def write_images_binary(images: dict[int, ColmapImage], path: str):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<idddddddi", im.id, *im.qvec, *im.tvec,
                                im.camera_id))
            f.write(im.name.encode("utf-8") + b"\x00")
            n = len(im.point3D_ids)
            f.write(struct.pack("<Q", n))
            for j in range(n):
                f.write(struct.pack("<ddq", im.xys[j, 0], im.xys[j, 1],
                                    int(im.point3D_ids[j])))


def write_points3d_binary(xyz: np.ndarray, rgb: np.ndarray, path: str):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<QdddBBBd", i, *xyz[i],
                                *[int(c) for c in rgb[i]], 0.0))
            f.write(struct.pack("<Q", 0))
