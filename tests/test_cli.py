"""CLI integration: train -> snapshot -> render -> metrics over a tiny
synthetic Blender scene, exercising the full user-facing pipeline
(config file loading, scene dispatch, two-stage training, PLY snapshot,
FPS render loop, metrics JSON)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import write_blender_fixture

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           # JAX_PLATFORMS alone is clobbered by the axon sitecustomize in
           # subprocesses (it pre-registers the TPU plugin); the CLIs honor
           # FOURDGS_PLATFORM via jax_setup.respect_platform_env — without
           # it these tests silently grab the TPU tunnel and contend with
           # any live training run (see .claude/skills/verify).
           FOURDGS_PLATFORM="cpu",
           PYTHONPATH="",
           XLA_FLAGS="--xla_force_host_platform_device_count=1")


def run(args, **kw):
    return subprocess.run([sys.executable] + args, cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=900, **kw)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    data = tmp_path_factory.mktemp("data")
    out = tmp_path_factory.mktemp("out")
    write_blender_fixture(data, n_frames=6, size=32)
    cfgfile = data / "tiny.py"
    cfgfile.write_text(
        "_base_ = '%s/fourdgs_tpu/configs/dnerf/bouncingballs.py'\n"
        "OptimizationParams = dict(iterations=30, coarse_iterations=20,\n"
        "    densify_from_iter=10, densification_interval=15,\n"
        "    batch_size=2)\n"
        "ModelHiddenParams = dict(\n"
        "    kplanes_config={'grid_dimensions': 2,\n"
        "        'input_coordinate_dim': 4, 'output_coordinate_dim': 8,\n"
        "        'resolution': [8, 8, 8, 4]}, net_width=32)\n"
        "RasterParams = dict(capacity=4096, tile_cap=128, pair_cap=16384,\n"
        "    chunk=8)\n" % REPO)
    r = run(["scripts/train.py", "-s", str(data), "-m", str(out / "model"),
             "--configs", str(cfgfile), "--expname", "tiny",
             "--test_iterations", "20", "--save_iterations", "30",
             "--checkpoint_iterations", "30"])
    assert r.returncode == 0, r.stderr[-3000:]
    return data, out / "model", r


class TestTrainCLI:
    def test_outputs_exist(self, trained_model):
        data, model, r = trained_model
        assert "Training complete" in r.stdout
        assert os.path.exists(model / "cfg_args.json")
        assert os.path.exists(model / "train_log.jsonl")
        # fine-stage snapshot at final iteration
        assert os.path.exists(
            model / "point_cloud/iteration_30/point_cloud.ply")
        assert os.path.exists(
            model / "point_cloud/iteration_30/deformation.npz")
        assert os.path.exists(model / "chkpnt_fine_30.npz")

    def test_config_file_applied(self, trained_model):
        data, model, r = trained_model
        cfg = json.load(open(model / "cfg_args.json"))
        assert cfg["opt"]["iterations"] == 30
        assert cfg["hidden"]["kplanes_config"]["resolution"] == [8, 8, 8, 4]
        # _base_ inheritance pulled dnerf defaults
        assert cfg["opt"]["pruning_interval"] == 8000
        assert cfg["hidden"]["defor_depth"] == 0

    def test_log_has_finite_losses(self, trained_model):
        data, model, r = trained_model
        recs = [json.loads(l) for l in open(model / "train_log.jsonl")]
        steps = [rec for rec in recs if "loss" in rec]
        assert len(steps) >= 2
        assert all(np.isfinite(rec["loss"]) for rec in steps)
        stages = {rec["stage"] for rec in steps}
        assert stages == {"coarse", "fine"}

    def test_log_has_full_split_eval(self, trained_model):
        # ref train.py:343-376: test eval covers the FULL test split and
        # a small train probe; per-view PSNRs recorded
        data, model, r = trained_model
        recs = [json.loads(l) for l in open(model / "train_log.jsonl")]
        evals = [rec for rec in recs if rec.get("eval") == "test"]
        assert evals, "no eval records in train_log.jsonl"
        for rec in evals:
            assert np.isfinite(rec["psnr"])
            assert np.isfinite(rec["train_probe_psnr"])
            assert len(rec["psnr_per_view"]) == 2  # full test split size


class TestRenderAndMetricsCLI:
    def test_render_and_metrics(self, trained_model):
        data, model, r = trained_model
        r2 = run(["scripts/render.py", "-m", str(model), "-s", str(data),
                  "--skip_video"])
        assert r2.returncode == 0, r2.stderr[-3000:]
        assert "FPS" in r2.stdout
        renders = model / "test/ours_30/renders"
        assert len(os.listdir(renders)) == 2  # test split size

        r3 = run(["scripts/metrics.py", "-m", str(model)])
        assert r3.returncode == 0, r3.stderr[-3000:]
        results = json.load(open(model / "results.json"))
        assert "ours_30" in results
        assert "PSNR" in results["ours_30"]
        assert np.isfinite(results["ours_30"]["PSNR"])
        per_view = json.load(open(model / "per_view.json"))
        assert len(per_view["ours_30"]["PSNR"]) == 2


class TestMeshCLI:
    def test_train_cli_mesh_evals_sharded(self, tmp_path_factory):
        """--mesh training end-to-end on the virtual CPU mesh, with the
        test-split eval routed through sharded_eval_render (round-2 gap:
        mesh runs fell back to single-device eval)."""
        data = tmp_path_factory.mktemp("mdata")
        out = tmp_path_factory.mktemp("mout")
        write_blender_fixture(data, n_frames=4, size=32)
        cfgfile = data / "tiny_mesh.py"
        cfgfile.write_text(
            "OptimizationParams = dict(iterations=8, coarse_iterations=6,\n"
            "    batch_size=2, densify_from_iter=100)\n"
            "ModelHiddenParams = dict(\n"
            "    kplanes_config={'grid_dimensions': 2,\n"
            "        'input_coordinate_dim': 4, 'output_coordinate_dim': 8,\n"
            "        'resolution': [8, 8, 8, 4]}, net_width=32,\n"
            "    multires=[1])\n"
            "RasterParams = dict(capacity=2048, tile_size=16, tile_cap=128,\n"
            "    pair_cap=16384, chunk=8, min_bucket=2048)\n")
        env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=8")
        r = subprocess.run(
            [sys.executable, "scripts/train.py", "-s", str(data), "-m",
             str(out / "model"), "--configs", str(cfgfile), "--expname",
             "tinymesh", "--mesh", "2,2", "--test_iterations", "4",
             "--save_iterations", "8"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        assert "training on mesh data=2 tile=2" in r.stdout
        assert "Evaluating test" in r.stdout
        log = [json.loads(l) for l in
               open(out / "model" / "train_log.jsonl")]
        evals = [rec for rec in log if rec.get("eval") == "test"]
        assert evals and np.isfinite(evals[-1]["psnr"])


class TestResume:
    def test_resume_from_checkpoint(self, trained_model):
        """--start_checkpoint with a fine-stage checkpoint must skip the
        coarse stage and continue (ref train.py:47-55 semantics)."""
        data, model, r = trained_model
        ckpt = str(model / "chkpnt_fine_30.npz")
        cfgfile = data / "tiny.py"
        r2 = run(["scripts/train.py", "-s", str(data), "-m",
                  str(model) + "_resumed", "--configs", str(cfgfile),
                  "--expname", "tiny2", "--start_checkpoint", ckpt,
                  "--test_iterations", "999", "--save_iterations", "30"])
        assert r2.returncode == 0, r2.stderr[-3000:]
        assert "skip coarse stage" in r2.stdout
        assert "resumed fine stage at iteration 30" in r2.stdout
        assert "Training complete" in r2.stdout
