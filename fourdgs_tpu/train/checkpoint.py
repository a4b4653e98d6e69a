"""Checkpoint / snapshot persistence.

Two formats, mirroring the reference's split (SURVEY.md §5.4):
  * model snapshots for rendering: point_cloud/{stage_}iteration_N/
    point_cloud.ply (byte-compatible 3DGS layout, alive points only) +
    deformation.npz (flattened deform pytree + aabb)
    (ref scene.save, scene/__init__.py:96-103)
  * full training checkpoints chkpnt_{stage}_{iter}.npz: every TrainState
    leaf (params, Adam moments, alive mask, accumulators) for exact resume
    (ref capture/restore, scene/gaussian_model.py:66-106 +
    torch.save at train.py:294-296)

Storage is plain npz with dotted key paths — no pickle, no torch, readable
by any numpy.
"""
from __future__ import annotations

import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data import ply
from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.train.state import TrainState


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif hasattr(tree, "_asdict"):
        for k, v in tree._asdict().items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(tree, flat, prefix=""):
    """Rebuild `tree`'s structure with arrays from `flat`."""
    if isinstance(tree, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/")
                for k, v in tree.items()}
    if hasattr(tree, "_asdict"):
        d = {k: _unflatten_into(v, flat, f"{prefix}{k}/")
             for k, v in tree._asdict().items()}
        return type(tree)(**d)
    if isinstance(tree, (list, tuple)):
        vals = [_unflatten_into(v, flat, f"{prefix}{i}/")
                for i, v in enumerate(tree)]
        return type(tree)(vals) if isinstance(tree, list) else tuple(vals)
    return jnp.asarray(flat[prefix[:-1]])


# ---------------------------------------------------------------------------
# Model snapshots (render-ready; PLY interoperable with 3DGS tooling)
# ---------------------------------------------------------------------------

def save_snapshot(state: TrainState, model_path: str, iteration: int,
                  stage: str = ""):
    tag = f"{stage}_iteration_{iteration}" if stage and stage != "fine" \
        else f"iteration_{iteration}"
    out_dir = os.path.join(model_path, "point_cloud", tag)
    os.makedirs(out_dir, exist_ok=True)
    alive = np.asarray(state.alive)
    g: GaussianParams = jax.tree.map(lambda x: np.asarray(x)[alive],
                                     state.params["gauss"])
    ply.save_gaussians(os.path.join(out_dir, "point_cloud.ply"),
                       g.xyz, g.features_dc, g.features_rest, g.opacity,
                       g.scaling, g.rotation)
    flat = _flatten(state.params["deform"])
    flat["__aabb__"] = np.asarray(state.aabb)
    np.savez(os.path.join(out_dir, "deformation.npz"), **flat)
    return out_dir


def load_snapshot(out_dir: str, max_sh_degree: int = 3):
    """-> (gauss arrays dict, deform flat dict, aabb)."""
    gauss = ply.load_gaussians(os.path.join(out_dir, "point_cloud.ply"),
                               max_sh_degree)
    z = np.load(os.path.join(out_dir, "deformation.npz"))
    flat = {k: z[k] for k in z.files}
    aabb = flat.pop("__aabb__")
    return gauss, flat, aabb


def find_latest_snapshot(model_path: str, iteration: int = -1,
                         stage_prefix: str = "") -> tuple[str, int]:
    """Pick a snapshot dir. `stage_prefix` restricts to one stage: "" (or
    "fine") matches un-prefixed `iteration_N` dirs; "coarse" matches
    `coarse_iteration_N`. Without it, fine snapshots win ties over coarse
    ones at the same iteration (fine is the later stage)."""
    root = os.path.join(model_path, "point_cloud")
    best, best_it, best_fine = None, -1, False
    pat = re.compile(r"^(?:(\w+)_)?iteration_(\d+)$")
    for name in os.listdir(root):
        m = pat.match(name)
        if not m:
            continue
        stage = m.group(1) or ""
        if stage_prefix and stage != (
                "" if stage_prefix == "fine" else stage_prefix):
            continue
        it = int(m.group(2))
        if iteration >= 0 and it != iteration:
            continue
        is_fine = stage == ""
        if it > best_it or (it == best_it and is_fine and not best_fine):
            best, best_it, best_fine = os.path.join(root, name), it, is_fine
    if best is None:
        raise FileNotFoundError(f"no snapshot under {root}")
    return best, best_it


def restore_gaussians_from_snapshot(out_dir: str, cap: int,
                                    max_sh_degree: int = 3):
    """-> (GaussianParams padded to cap, alive, deform flat dict, aabb)."""
    gauss, deform_flat, aabb = load_snapshot(out_dir, max_sh_degree)
    n = gauss["xyz"].shape[0]
    cap = max(cap, n)

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = GaussianParams(
        xyz=pad(gauss["xyz"]),
        features_dc=pad(gauss["features_dc"]),
        features_rest=pad(gauss["features_rest"]),
        scaling=pad(gauss["scaling"]),
        rotation=pad(gauss["rotation"]).at[n:, 0].set(1.0),
        opacity=pad(gauss["opacity"]))
    alive = jnp.zeros((cap,), bool).at[:n].set(True)
    return params, alive, deform_flat, aabb


def deform_params_from_flat(template: dict, flat: dict) -> dict:
    return _unflatten_into(template, flat)


# ---------------------------------------------------------------------------
# Full training checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(state: TrainState, path: str, iteration: int,
                    stage: str, active_sh: int = 0):
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    flat = _flatten(state._asdict())
    flat["__iteration__"] = np.asarray(iteration)
    flat["__stage__"] = np.frombuffer(stage.encode(), dtype=np.uint8)
    flat["__active_sh__"] = np.asarray(active_sh)
    np.savez(path, **flat)


def load_checkpoint(path: str, template: TrainState
                    ) -> tuple[TrainState, int, str, int]:
    """-> (state, iteration, stage, active_sh). active_sh falls back to the
    reference's 1-degree-per-1000-iterations ramp for old checkpoints
    (ref oneupSHdegree at train.py:141-142)."""
    z = np.load(path)
    flat = {k: z[k] for k in z.files}
    iteration = int(flat.pop("__iteration__"))
    stage = flat.pop("__stage__").tobytes().decode()
    if "__active_sh__" in flat:
        active_sh = int(flat.pop("__active_sh__"))
    else:
        active_sh = min(iteration // 1000, 3)
    state = _unflatten_into(template, {k: v for k, v in flat.items()})
    return state, iteration, stage, active_sh
