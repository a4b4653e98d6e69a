"""Two-process DCN test (VERDICT r4 Missing #3): spawn two real OS
processes, each with 4 virtual CPU devices, joined through
jax.distributed.initialize into one 8-device cluster; run one
sharded_train_step over the ('data', 'tile') = (2, 4) mesh with the data
axis crossing the process boundary (the DCN path in production), and
assert the result equals this process's single-process 8-device step.

The reference has no distributed anything (SURVEY.md §5.8) — this pins the
greenfield multi-host seam: same-seed batch slicing (host_batch_slice),
host-local -> global array assembly (global_batch), and the gradient psum
over the data axis riding the cross-process backend."""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.parallel import make_mesh
from fourdgs_tpu.train import loop, optim, state as state_mod
from fourdgs_tpu.train.state import deform_config_from

from tests.test_e2e_train import H, W, make_gt_data, smoke_config

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_process(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(i), outs[i]],
        env=env, cwd=root, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # single-process 8-device reference (this process; conftest mesh)
    cams, images, true_means, true_colors = make_gt_data()
    cfg = smoke_config()
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05,
                                  true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    dcfg = deform_config_from(cfg)
    idxs = np.arange(4) % len(images)
    bc = jax.tree.map(lambda a: a[idxs], cams)
    ref_state, ref_aux = loop.train_step(
        st, bc, images[idxs], jnp.zeros(3), stage="coarse", active_sh=0,
        raster_cfg=rcfg, deform_cfg=dcfg, tx=tx, lambda_dssim=0.0,
        reg_weights=(0.01, 1e-4, 1e-4), track_stats=True)

    results = [np.load(o) for o in outs]
    # the two processes must agree exactly (same global computation)
    assert results[0]["loss"] == results[1]["loss"]
    for name in ("xyz", "scaling", "opacity", "denom"):
        np.testing.assert_array_equal(results[0][name], results[1][name],
                                      err_msg=name)
    # and match the single-process step numerically
    assert results[0]["loss"] == pytest.approx(float(ref_aux.l1), rel=1e-4)
    for name in ("xyz", "scaling", "opacity"):
        np.testing.assert_allclose(
            results[0][name],
            np.asarray(getattr(ref_state.params["gauss"], name)),
            atol=5e-5, err_msg=name)
    np.testing.assert_allclose(results[0]["denom"],
                               np.asarray(ref_state.denom))
