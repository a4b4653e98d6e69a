"""Data-layer tests: PLY round-trips, COLMAP parsers, dataset readers over
tiny synthetic fixtures, scene-type dispatch (SURVEY.md hard-part #5: pose
conventions are unit-tested since pose bugs look like training bugs)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from fourdgs_tpu.data import colmap, ply
from fourdgs_tpu.data.scene import Scene, detect_scene_type, load_scene_info
from fourdgs_tpu.data.scene_info import blender_matrix_to_rt, nerfpp_norm
from fourdgs_tpu.ops.transforms import world_to_view


class TestPly:
    def test_point_cloud_roundtrip(self, tmp_path, rng):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.uniform(0, 255, (50, 3)).astype(np.float32)
        p = str(tmp_path / "pc.ply")
        ply.store_point_cloud(p, xyz, rgb)
        pts, cols, normals = ply.fetch_point_cloud(p)
        np.testing.assert_allclose(pts, xyz, atol=1e-6)
        np.testing.assert_allclose(cols, rgb / 255.0, atol=1e-6)

    def test_gaussian_roundtrip(self, tmp_path, rng):
        n, deg = 20, 3
        k = (deg + 1) ** 2
        data = dict(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(n, k - 1, 3)).astype(np.float32),
            opacity=rng.normal(size=(n, 1)).astype(np.float32),
            scaling=rng.normal(size=(n, 3)).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )
        p = str(tmp_path / "gauss.ply")
        ply.save_gaussians(p, **data)
        out = ply.load_gaussians(p, max_sh_degree=deg)
        for name in data:
            np.testing.assert_allclose(out[name], data[name], atol=1e-6,
                                       err_msg=name)

    def test_reads_uchar_colors(self, tmp_path):
        """Third-party PLYs store colors as uchar."""
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 2\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
                  b"end_header\n")
        body = b""
        for i in range(2):
            body += np.array([i, 0, 0], "<f4").tobytes()
            body += np.array([255, 128, 0], "u1").tobytes()
        p = tmp_path / "uchar.ply"
        p.write_bytes(header + body)
        pts, cols, _ = ply.fetch_point_cloud(str(p))
        np.testing.assert_allclose(pts[:, 0], [0, 1])
        np.testing.assert_allclose(cols[0], [1.0, 128 / 255, 0.0], atol=1e-3)


class TestColmap:
    def test_qvec_roundtrip(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-6)

    def test_binary_roundtrip(self, tmp_path, rng):
        cams = {1: colmap.ColmapCamera(id=1, model="PINHOLE", width=640,
                                       height=480,
                                       params=np.array([500.0, 510, 320, 240]))}
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images = {1: colmap.ColmapImage(
            id=1, qvec=q, tvec=rng.normal(size=3), camera_id=1,
            name="frame_00001.jpg", xys=rng.normal(size=(5, 2)),
            point3D_ids=np.arange(5, dtype=np.int64))}
        xyz = rng.normal(size=(7, 3))
        rgb = rng.uniform(0, 255, (7, 3)).astype(np.uint8)

        colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
        colmap.write_images_binary(images, str(tmp_path / "images.bin"))
        colmap.write_points3d_binary(xyz, rgb, str(tmp_path / "points3D.bin"))

        cams2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
        ims2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
        xyz2, rgb2, _ = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))

        assert cams2[1].model == "PINHOLE"
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        assert ims2[1].name == "frame_00001.jpg"
        np.testing.assert_allclose(ims2[1].qvec, q)
        np.testing.assert_allclose(xyz2, xyz)
        np.testing.assert_allclose(rgb2, rgb)

    def test_text_parsers(self, tmp_path):
        (tmp_path / "cameras.txt").write_text(
            "# comment\n1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
        (tmp_path / "images.txt").write_text(
            "# comment\n1 1 0 0 0 0.5 0.5 0.5 1 img.png\n"
            "1.0 2.0 3\n")
        cams = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
        ims = colmap.read_images_text(str(tmp_path / "images.txt"))
        assert cams[1].width == 640
        assert ims[1].name == "img.png"
        np.testing.assert_allclose(ims[1].tvec, [0.5, 0.5, 0.5])


def write_blender_fixture(root, n_frames=4, size=32):
    rng = np.random.default_rng(0)
    os.makedirs(root / "train", exist_ok=True)
    os.makedirs(root / "test", exist_ok=True)
    for split, n in (("train", n_frames), ("test", 2)):
        frames = []
        for i in range(n):
            theta = 2 * np.pi * i / n
            c2w = np.eye(4)
            c2w[0, 3] = 3 * np.sin(theta)
            c2w[2, 3] = 3 * np.cos(theta)
            img = (rng.uniform(0, 255, (size, size, 4))).astype(np.uint8)
            name = f"./{split}/r_{i}"
            Image.fromarray(img, "RGBA").save(root / f"{split}/r_{i}.png")
            frames.append({"file_path": name, "time": i / max(n - 1, 1),
                           "transform_matrix": c2w.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


class TestBlenderReader:
    def test_full_scene(self, tmp_path):
        write_blender_fixture(tmp_path)
        assert detect_scene_type(str(tmp_path)) == "Blender"
        from fourdgs_tpu.data.blender import read_blender_scene
        info = read_blender_scene(str(tmp_path), white_background=True,
                                  eval_split=True, resolution=(32, 32))
        assert len(info.train_cameras) == 4
        assert len(info.test_cameras) == 2
        assert len(info.video_cameras) == 160
        assert info.maxtime == 1.0
        times = [c.time for c in info.train_cameras]
        assert min(times) == 0.0 and max(times) == 1.0
        assert info.point_cloud.points.shape == (2000, 3)
        assert info.nerf_normalization["radius"] == pytest.approx(3 * 1.1,
                                                                  rel=0.01)
        img = info.train_cameras[0].image
        assert img.shape == (32, 32, 3)
        assert img.dtype == np.float32

    def test_camera_pose_convention(self):
        """Pin down the reference's exact sign-flip convention
        (ref scene/dataset_readers.py:272-275): pose bugs look like training
        bugs, so the formula is regression-locked here."""
        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        from fourdgs_tpu.ops.transforms import quat_to_rotmat
        import jax.numpy as jnp
        Rc2w = np.asarray(quat_to_rotmat(jnp.asarray(q[None]))[0])
        c2w = np.eye(4)
        c2w[:3, :3] = Rc2w
        c2w[:3, 3] = rng.normal(size=3)
        R, T = blender_matrix_to_rt(c2w)
        w2c = np.linalg.inv(c2w)
        expected_R = -w2c[:3, :3].T
        expected_R[:, 0] = -expected_R[:, 0]
        np.testing.assert_allclose(R, expected_R, atol=1e-7)
        np.testing.assert_allclose(T, -w2c[:3, 3], atol=1e-7)
        # resulting world->view applies diag(1,-1,-1) to the rotation rows
        # (OpenGL->COLMAP axis convention) and negates the translation
        W = world_to_view(R, T)
        np.testing.assert_allclose(
            W[:3, :3], np.diag([1.0, -1, -1]) @ w2c[:3, :3], atol=1e-6)
        np.testing.assert_allclose(W[:3, 3], -w2c[:3, 3], atol=1e-6)

    def test_scene_facade_stacks(self, tmp_path):
        write_blender_fixture(tmp_path)
        scene = Scene.load(str(tmp_path), resolution=(32, 32))
        assert len(scene.train) == 4
        assert scene.train.images.shape == (4, 32, 32, 3)
        assert scene.train.cameras.world_view.shape == (4, 4, 4)
        assert scene.aabb.shape == (2, 3)
        assert scene.maxtime == 1.0
        mask = scene.zerostamp_mask()
        assert mask.sum() == 1


class TestDispatch:
    def test_unknown_raises(self, tmp_path):
        with pytest.raises(ValueError):
            detect_scene_type(str(tmp_path))

    def test_markers(self, tmp_path):
        """Priority order matches ref scene/__init__.py:45-65."""
        (tmp_path / "dataset.json").write_text("{}")
        assert detect_scene_type(str(tmp_path)) == "nerfies"
        (tmp_path / "poses_bounds.npy").write_bytes(b"")
        assert detect_scene_type(str(tmp_path)) == "dynerf"
        (tmp_path / "transforms_train.json").write_text("{}")
        assert detect_scene_type(str(tmp_path)) == "Blender"
        os.makedirs(tmp_path / "sparse")
        assert detect_scene_type(str(tmp_path)) == "Colmap"


class TestMultiviewAndColmapScene:
    def _write_rig(self, root, n_cams=2, n_frames=4, size=24):
        rng = np.random.default_rng(0)
        cams = {1: colmap.ColmapCamera(id=1, model="SIMPLE_PINHOLE",
                                       width=size, height=size,
                                       params=np.array([30.0, size / 2,
                                                        size / 2]))}
        images = {}
        for c in range(n_cams):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            images[c + 1] = colmap.ColmapImage(
                id=c + 1, qvec=q, tvec=rng.normal(size=3) * 3, camera_id=1,
                name=f"frame{c+1:02d}.jpg", xys=np.zeros((0, 2)),
                point3D_ids=np.zeros(0, np.int64))
            d = root / f"cam{c+1:02d}"
            os.makedirs(d, exist_ok=True)
            for i in range(n_frames):
                arr = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"frame_{i+1:05d}.jpg")
        os.makedirs(root / "sparse_", exist_ok=True)
        colmap.write_cameras_binary(cams, str(root / "sparse_/cameras.bin"))
        colmap.write_images_binary(images, str(root / "sparse_/images.bin"))
        xyz = rng.normal(size=(30, 3))
        rgb = rng.uniform(0, 255, (30, 3))
        ply.store_point_cloud(str(root / "points3D_multipleview.ply"), xyz, rgb)

    def test_multiview(self, tmp_path):
        self._write_rig(tmp_path)
        assert detect_scene_type(str(tmp_path)) == "MultipleView"
        from fourdgs_tpu.data.multiview import read_multipleview_scene
        info = read_multipleview_scene(str(tmp_path), load_images=True)
        assert len(info.train_cameras) == 2 * 4
        assert len(info.test_cameras) == 2 * 3
        assert info.train_cameras[0].image.shape == (24, 24, 3)
        times = sorted({c.time for c in info.train_cameras})
        assert times == [0.0, 0.25, 0.5, 0.75]


class TestHyperReader:
    def _write_fixture(self, root, n=8, size=16):
        rng = np.random.default_rng(0)
        os.makedirs(root / "camera", exist_ok=True)
        os.makedirs(root / "rgb/2x", exist_ok=True)
        ids = [f"{i:06d}" for i in range(n)]
        meta = {}
        for i, iid in enumerate(ids):
            q = rng.normal(size=4)
            from scipy.spatial.transform import Rotation
            orient = Rotation.from_quat(q / np.linalg.norm(q)).as_matrix()
            cam = {
                "orientation": orient.tolist(),
                "position": (rng.normal(size=3) * 2).tolist(),
                "focal_length": 100.0,
                "principal_point": [size, size],
                "image_size": [2 * size, 2 * size],
                "skew": 0.0, "pixel_aspect_ratio": 1.0,
                "radial_distortion": [0, 0, 0],
                "tangential_distortion": [0, 0],
            }
            with open(root / f"camera/{iid}.json", "w") as f:
                json.dump(cam, f)
            arr = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / f"rgb/2x/{iid}.png")
            meta[iid] = {"camera_id": 0, "warp_id": i, "appearance_id": i}
        with open(root / "metadata.json", "w") as f:
            json.dump(meta, f)
        with open(root / "dataset.json", "w") as f:
            json.dump({"ids": ids, "val_ids": [], "train_ids": []}, f)
        with open(root / "scene.json", "w") as f:
            json.dump({"near": 0.1, "far": 10.0, "scale": 1.0,
                       "center": [0, 0, 0]}, f)
        xyz = rng.normal(size=(30, 3))
        ply.store_point_cloud(str(root / "points3D_downsample2.ply"), xyz,
                              rng.uniform(0, 255, (30, 3)))

    def test_hyper_scene(self, tmp_path):
        self._write_fixture(tmp_path)
        from fourdgs_tpu.data.hyper import read_hyper_scene
        info = read_hyper_scene(str(tmp_path), load_images=True)
        # every-4th split: train = {0,4}, test = train+2 truncated = {2}
        assert len(info.train_cameras) == 2
        assert len(info.test_cameras) == 1
        assert info.maxtime == 1.0
        assert info.train_cameras[0].image.shape == (16, 16, 3)
        # time normalized by max warp id
        assert info.train_cameras[1].time == pytest.approx(4 / 7)


class TestPanopticReader:
    def test_panoptic_scene(self, tmp_path):
        rng = np.random.default_rng(0)
        size = 16
        os.makedirs(tmp_path / "ims/c0", exist_ok=True)
        k = [[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]]
        fns, ks, w2cs = [], [], []
        for t in range(3):
            arr = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"ims/c0/{t}.jpg")
            fns.append([f"c0/{t}.jpg"])
            ks.append([k])
            w2c = np.eye(4)
            w2c[2, 3] = 3.0
            w2cs.append([w2c.tolist()])
        meta = {"w": size, "h": size, "fn": fns, "k": ks, "w2c": w2cs,
                "cam_id": [[0], [0], [0]]}
        for name in ("train_meta.json", "test_meta.json"):
            with open(tmp_path / name, "w") as f:
                json.dump(meta, f)
        data = np.concatenate(
            [rng.normal(size=(20, 3)), rng.uniform(0, 1, (20, 3)),
             np.ones((20, 1))], axis=1)
        np.savez(tmp_path / "init_pt_cld.npz", data=data)

        assert detect_scene_type(str(tmp_path)) == "PanopticSports"
        from fourdgs_tpu.data.panoptic import read_panoptic_scene
        info = read_panoptic_scene(str(tmp_path), load_images=True)
        assert len(info.train_cameras) == 3
        assert info.maxtime == 3
        cam = info.train_cameras[0]["camera"]
        assert cam.world_view.shape == (4, 4)
        scene = Scene.load(str(tmp_path))
        assert scene.train.images.shape == (3, size, size, 3)


class TestDownscale:
    def test_stack_downscale(self, tmp_path):
        write_blender_fixture(tmp_path)
        scene = Scene.load(str(tmp_path), resolution=(32, 32), downscale=2)
        assert scene.train.images.shape == (4, 16, 16, 3)
        assert (scene.train.width, scene.train.height) == (16, 16)


class TestColmapModelConversion:
    """Full-fidelity model round trip (scripts/colmap_converter.py parity
    with ref scripts/colmap_converter.py): point ids and observation
    tracks must survive bin -> txt -> bin."""

    def _model(self):
        rng = np.random.default_rng(11)
        cams = {1: colmap.ColmapCamera(id=1, model="PINHOLE", width=640,
                                       height=480,
                                       params=np.array([500., 500., 320.,
                                                        240.]))}
        images = {
            3: colmap.ColmapImage(
                id=3, qvec=np.array([1.0, 0, 0, 0]),
                tvec=np.array([0.1, -0.2, 2.0]), camera_id=1,
                name="frame_0001.png",
                xys=rng.uniform(0, 640, (5, 2)),
                point3D_ids=np.array([7, -1, 9, 7, -1], np.int64))}
        pts = {
            7: colmap.ColmapPoint3D(
                id=7, xyz=np.array([0.3, -0.5, 1.7]),
                rgb=np.array([255., 10., 0.]), error=0.25,
                image_ids=np.array([3, 3], np.int32),
                point2D_idxs=np.array([0, 3], np.int32)),
            9: colmap.ColmapPoint3D(
                id=9, xyz=np.array([1.0, 2.0, 3.0]),
                rgb=np.array([0., 0., 128.]), error=1.5,
                image_ids=np.array([3], np.int32),
                point2D_idxs=np.array([2], np.int32))}
        return cams, images, pts

    def _assert_equal(self, a, b):
        cams, images, pts = a
        cams2, images2, pts2 = b
        assert cams2[1].model == cams[1].model
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        im, im2 = images[3], images2[3]
        assert im2.name == im.name and im2.camera_id == im.camera_id
        np.testing.assert_allclose(im2.qvec, im.qvec)
        np.testing.assert_allclose(im2.tvec, im.tvec)
        np.testing.assert_allclose(im2.xys, im.xys)
        np.testing.assert_array_equal(im2.point3D_ids, im.point3D_ids)
        assert set(pts2) == set(pts)
        for pid in pts:
            np.testing.assert_allclose(pts2[pid].xyz, pts[pid].xyz)
            np.testing.assert_allclose(pts2[pid].rgb, pts[pid].rgb)
            assert pts2[pid].error == pytest.approx(pts[pid].error)
            np.testing.assert_array_equal(pts2[pid].image_ids,
                                          pts[pid].image_ids)
            np.testing.assert_array_equal(pts2[pid].point2D_idxs,
                                          pts[pid].point2D_idxs)

    def test_bin_txt_bin_roundtrip(self, tmp_path):
        model = self._model()
        colmap.write_model(*model, str(tmp_path / "bin"), ext=".bin")
        m_bin = colmap.read_model(str(tmp_path / "bin"))       # auto-detect
        self._assert_equal(model, m_bin)
        colmap.write_model(*m_bin, str(tmp_path / "txt"), ext=".txt")
        m_txt = colmap.read_model(str(tmp_path / "txt"), ext=".txt")
        self._assert_equal(model, m_txt)
        colmap.write_model(*m_txt, str(tmp_path / "bin2"), ext=".bin")
        self._assert_equal(model, colmap.read_model(str(tmp_path / "bin2"),
                                                    ext=".bin"))

    def test_converter_cli(self, tmp_path):
        import subprocess, sys, os
        model = self._model()
        colmap.write_model(*model, str(tmp_path / "in"), ext=".bin")
        out = subprocess.run(
            [sys.executable, "scripts/colmap_converter.py",
             "--input_model", str(tmp_path / "in"),
             "--output_model", str(tmp_path / "out"),
             "--output_format", ".txt"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert out.returncode == 0, out.stderr
        assert "num_points3D: 2" in out.stdout
        self._assert_equal(model,
                           colmap.read_model(str(tmp_path / "out"), ".txt"))


class TestHypernerf2Colmap:
    def test_round_trip(self, tmp_path):
        """from_hypernerf (ref scripts/hypernerf2colmap.py parity) writes a
        COLMAP text model whose poses round-trip through our parser."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "scripts"))
        from poses2colmap import from_hypernerf

        from fourdgs_tpu.data.colmap import (qvec2rotmat, read_cameras_text,
                                             read_images_text)

        root = tmp_path
        (root / "camera").mkdir()
        (root / "rgb" / "2x").mkdir(parents=True)
        rng = np.random.default_rng(3)
        true = []
        for i in range(8):
            # random rotation via QR
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            pos = rng.normal(size=3)
            cam = {"orientation": q.tolist(), "position": pos.tolist(),
                   "focal_length": 512.0, "principal_point": [256.0, 192.0],
                   "image_size": [512, 384]}
            with open(root / "camera" / f"cam_{i:04d}.json", "w") as f:
                json.dump(cam, f)
            img = np.zeros((4, 4, 3), np.uint8)
            Image.fromarray(img).save(root / "rgb" / "2x" / f"{i:04d}.png")
            true.append((q, pos))
        from_hypernerf(str(root), max_images=4)

        cams = read_cameras_text(str(root / "sparse_" / "cameras.txt"))
        imgs = read_images_text(str(root / "sparse_" / "images.txt"))
        assert len(cams) == len(imgs) == 4
        assert os.path.exists(root / "sparse_" / "points3D.txt")
        for iid, im in imgs.items():
            src = int(im.name.split(".")[0])
            q_true, pos_true = true[src]
            r = qvec2rotmat(im.qvec)
            np.testing.assert_allclose(r, q_true, atol=1e-6)
            np.testing.assert_allclose(im.tvec, -q_true @ pos_true,
                                       atol=1e-6)
            c = cams[im.camera_id]
            assert c.width == 256 and c.height == 192
            np.testing.assert_allclose(c.params[0], 256.0)
        # copied frames for the triangulator
        assert len(os.listdir(root / "image_colmap")) == 4
