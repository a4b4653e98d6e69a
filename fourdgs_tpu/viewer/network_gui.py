"""SIBR remote-viewer TCP bridge.

Speaks the 3DGS network-GUI wire protocol so any SIBR-protocol client can
connect during training (contract: ref gaussian_renderer/network_gui.py:
26-86 — length-prefixed little-endian JSON request with resolution, fovs,
near/far, row-major view & view-projection matrices with Y/Z columns
flipped; reply = raw HxWx3 bytes + length-prefixed verify string).

The render itself happens on TPU via the caller-provided render function;
this module only owns sockets and camera decoding.
"""
from __future__ import annotations

import json
import socket
import traceback
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data.camera import Camera


class GuiRequest(NamedTuple):
    camera: Camera | None
    width: int
    height: int
    do_training: bool
    do_shs_python: bool
    do_rot_scale_python: bool
    keep_alive: bool
    scaling_modifier: float


class NetworkGui:
    def __init__(self):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.conn = None
        self.addr = None

    def init(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self):
        if self.conn is not None:
            return
        try:
            self.conn, self.addr = self.listener.accept()
            print(f"\nConnected by {self.addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self) -> dict:
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self, time: float = 0.0) -> GuiRequest:
        msg = self._read()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return GuiRequest(None, 0, 0, False, False, False, False, 1.0)
        try:
            # the client sends torch-style transposed matrices; flip Y/Z
            # columns and transpose into our column-vector convention
            view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
            view[:, 1] = -view[:, 1]
            view[:, 2] = -view[:, 2]
            full = np.array(msg["view_projection_matrix"],
                            np.float32).reshape(4, 4)
            full[:, 1] = -full[:, 1]
            w2c = view.T
            cam_center = np.linalg.inv(w2c)[:3, 3]
            camera = Camera(
                world_view=jnp.asarray(w2c),
                full_proj=jnp.asarray(full.T),
                cam_center=jnp.asarray(cam_center),
                tanfovx=jnp.float32(np.tan(msg["fov_x"] * 0.5)),
                tanfovy=jnp.float32(np.tan(msg["fov_y"] * 0.5)),
                time=jnp.float32(time),
            )
        except Exception:
            traceback.print_exc()
            raise
        return GuiRequest(
            camera=camera, width=width, height=height,
            do_training=bool(msg["train"]),
            do_shs_python=bool(msg["shs_python"]),
            do_rot_scale_python=bool(msg["rot_scale_python"]),
            keep_alive=bool(msg["keep_alive"]),
            scaling_modifier=float(msg["scaling_modifier"]))

    def send_image(self, image: np.ndarray | None, verify: str):
        """image: (H, W, 3) float in [0,1] or None."""
        if image is not None:
            data = (np.clip(np.asarray(image), 0, 1)
                    * 255).astype(np.uint8).tobytes()
            self.conn.sendall(data)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def disconnect(self):
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
        self.conn = None

    def poll(self, render_fn, source_path: str, time: float = 0.0,
             training_done: bool = False) -> bool:
        """One training-loop poll (ref train.py:109-134): serve as many GUI
        frames as requested; returns True to continue training."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                req = self.receive(time=time)
                img = None
                if req.camera is not None:
                    img = render_fn(req.camera, req.width, req.height,
                                    req.scaling_modifier)
                self.send_image(img, source_path)
                if req.do_training and (not training_done or not req.keep_alive):
                    break
            except Exception as e:
                print(e)
                self.disconnect()
        return True
