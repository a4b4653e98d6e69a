"""Checkpoint/snapshot round-trips and the viewer protocol."""
import json
import os
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.train import checkpoint
from tests.test_train import make_state, tiny_config


class TestSnapshots:
    def test_snapshot_roundtrip(self, tmp_path):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=32)
        out = checkpoint.save_snapshot(st, str(tmp_path), 100, "fine")
        assert out.endswith("iteration_100")
        gauss, alive, dflat, aabb = \
            checkpoint.restore_gaussians_from_snapshot(out, cap=64,
                                                       max_sh_degree=1)
        assert int(alive.sum()) == 32
        np.testing.assert_allclose(np.asarray(gauss.xyz[:32]),
                                   np.asarray(st.params["gauss"].xyz[:32]),
                                   atol=1e-6)
        template = st.params["deform"]
        deform = checkpoint.deform_params_from_flat(template, dflat)
        for (p1, p2) in zip(jax.tree.leaves(template), jax.tree.leaves(deform)):
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                       atol=1e-7)
        np.testing.assert_allclose(aabb, np.asarray(st.aabb))

    def test_coarse_stage_tag(self, tmp_path):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=8)
        out = checkpoint.save_snapshot(st, str(tmp_path), 5, "coarse")
        assert "coarse_iteration_5" in out
        path, it = checkpoint.find_latest_snapshot(str(tmp_path))
        assert it == 5

    def test_full_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=16)
        p = str(tmp_path / "chk.npz")
        checkpoint.save_checkpoint(st, p, 123, "fine", active_sh=2)
        st2, it, stage, active_sh = checkpoint.load_checkpoint(p, st)
        assert (it, stage, active_sh) == (123, "fine", 2)
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0, err_msg="exact resume")


class TestViewerProtocol:
    def test_request_response_cycle(self):
        from fourdgs_tpu.viewer.network_gui import NetworkGui

        gui = NetworkGui()
        gui.init("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]

        w = h = 8
        view = np.eye(4)
        msg = {
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 0.8, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": view.flatten().tolist(),
            "view_projection_matrix": view.flatten().tolist(),
        }

        result = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            payload = json.dumps(msg).encode()
            s.sendall(len(payload).to_bytes(4, "little") + payload)
            img = b""
            while len(img) < w * h * 3:
                img += s.recv(w * h * 3 - len(img))
            vlen = int.from_bytes(s.recv(4), "little")
            verify = s.recv(vlen).decode()
            result["img"] = img
            result["verify"] = verify
            s.close()

        t = threading.Thread(target=client)
        t.start()
        import time as time_mod
        for _ in range(100):
            gui.try_connect()
            if gui.conn is not None:
                break
            time_mod.sleep(0.05)
        assert gui.conn is not None
        req = gui.receive(time=0.25)
        assert req.camera is not None
        assert req.width == w and req.do_training
        assert float(req.camera.time) == pytest.approx(0.25)
        gui.send_image(np.full((h, w, 3), 0.5), "srcpath")
        t.join(timeout=5)
        assert result["verify"] == "srcpath"
        assert len(result["img"]) == w * h * 3
        assert result["img"][0] == 127
        gui.disconnect()
