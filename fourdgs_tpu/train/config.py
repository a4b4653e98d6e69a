"""Configuration system.

Four parameter groups mirroring the reference's hyperparameter surface
(ref arguments/__init__.py:47-150) as plain dataclasses, plus:
  * python config files with `_base_` inheritance (the reference's mmcv
    pattern, ref utils/params_utils.py:1-9) loaded by exec - no mmcv needed
  * argparse wiring: every field becomes a --flag
  * `cfg_args`-style dump/merge for post-train tools
    (ref arguments/__init__.py:152-172)

TPU-specific additions live in their own group (RasterParams): buffer
capacity, tile capacity, pair budget, chunk size, backend selection.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelParams:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = True
    data_device: str = "tpu"
    eval: bool = True
    render_process: bool = False
    add_points: bool = False
    extension: str = ".png"
    llffhold: int = 8


@dataclass
class PipelineParams:
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class ModelHiddenParams:
    net_width: int = 64
    timebase_pe: int = 4
    defor_depth: int = 1
    posebase_pe: int = 10
    scale_rotation_pe: int = 2
    opacity_pe: int = 2
    timenet_width: int = 64
    timenet_output: int = 32
    bounds: float = 1.6
    plane_tv_weight: float = 0.0001
    time_smoothness_weight: float = 0.01
    l1_time_planes: float = 0.0001
    kplanes_config: dict = field(default_factory=lambda: {
        "grid_dimensions": 2,
        "input_coordinate_dim": 4,
        "output_coordinate_dim": 32,
        "resolution": [64, 64, 64, 25],
    })
    multires: list = field(default_factory=lambda: [1, 2, 4, 8])
    no_dx: bool = False
    no_grid: bool = False
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = True
    no_dshs: bool = True
    empty_voxel: bool = False
    grid_pe: int = 0
    static_mlp: bool = False
    apply_rotation: bool = False
    weight_decay_iteration: int = 5000
    # soft delta saturation bounds (0 = reference-exact unbounded); see
    # models/deformation.py DeformConfig
    deform_dx_bound: float = 0.0
    deform_ds_bound: float = 0.0
    deform_dr_bound: float = 0.0


@dataclass
class OptimizationParams:
    dataloader: bool = False
    zerostamp_init: bool = False
    custom_sampler: Any = None
    iterations: int = 30_000
    coarse_iterations: int = 3000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 20_000
    deformation_lr_init: float = 0.00016
    deformation_lr_final: float = 0.000016
    deformation_lr_delay_mult: float = 0.01
    grid_lr_init: float = 0.0016
    grid_lr_final: float = 0.00016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.0
    lambda_lpips: float = 0.0
    weight_constraint_init: float = 1.0
    weight_constraint_after: float = 0.2
    weight_decay_iteration: int = 5000
    opacity_reset_interval: int = 3000
    densification_interval: int = 100
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold_coarse: float = 0.0002
    densify_grad_threshold_fine_init: float = 0.0002
    densify_grad_threshold_after: float = 0.0002
    pruning_from_iter: int = 500
    pruning_interval: int = 100
    opacity_threshold_coarse: float = 0.005
    opacity_threshold_fine_init: float = 0.005
    opacity_threshold_fine_after: float = 0.005
    batch_size: int = 1
    add_point: bool = False
    # reference densification count gates (ref train.py:270,274)
    densify_max_points: int = 360_000
    prune_min_points: int = 200_000


@dataclass
class RasterParams:
    """TPU rasterizer/runtime knobs (no reference equivalent: the CUDA
    rasterizer allocates dynamically; XLA needs static budgets)."""
    capacity: int = 400_000      # Gaussian buffer slots
    # 32x32 tiles measure ~1.7x faster end-to-end than 16x16 on v5e at the
    # D-NeRF operating point: ~2.4x fewer (gaussian, tile) pairs shrinks
    # every row-count-bound gather/scatter stage (binner, attr pack, grad
    # scatter) while the wider blend blocks pipeline better.
    tile_size: int = 32
    tile_cap: int = 2048
    pair_cap: int = 1 << 21
    chunk: int = 32
    backend: str = "auto"        # "auto" | "xla" | "pallas"
    bin_chunk: int = 4096        # gaussians per counting-binner scan step
    bin_pairs_per_chunk: int = 16384  # pair slots per scan step
    fuse_pack: bool = False      # binner emits packed attr rows (measured slower on v5e; see RasterConfig)
    # Auto-double tile_cap / bin_pairs_per_chunk when the binner reports
    # overflow drops (the CUDA rasterizer grows buffers dynamically —
    # ref submodule resizeFunctional; static caps must grow explicitly or
    # they silently drop the furthest splats). One recompile per growth.
    autogrow: bool = True
    # bucketed-capacity schedule (loop.pick_bucket): LIVE buffer capacity is
    # the smallest bucket >= n_alive * bucket_headroom, floored at
    # min_bucket (pow2 below 64k, 64k multiples above — see
    # loop.pick_bucket). Each distinct bucket costs one train-step
    # compile (background-prewarmed); raise min_bucket (or headroom) so a
    # run sees fewer buckets.
    min_bucket: int = 4096
    bucket_headroom: float = 1.5
    # AOT-compile the NEXT bucket's train step on a background thread while
    # training continues (populates the persistent compilation cache, so
    # the bucket switch pays tracing only, not the 60-90 s XLA compile).
    prewarm: bool = True
    # minimum iterations between tile_cap changes before a SHRINK is
    # considered (see loop.py: opacity resets spike the needed cap)
    cap_shrink_spacing: int = 2000


@dataclass
class Config:
    model: ModelParams = field(default_factory=ModelParams)
    pipe: PipelineParams = field(default_factory=PipelineParams)
    opt: OptimizationParams = field(default_factory=OptimizationParams)
    hidden: ModelHiddenParams = field(default_factory=ModelHiddenParams)
    raster: RasterParams = field(default_factory=RasterParams)
    expname: str = ""
    seed: int = 6666


_GROUPS = {"ModelParams": "model", "PipelineParams": "pipe",
           "OptimizationParams": "opt", "ModelHiddenParams": "hidden",
           "RasterParams": "raster"}


def _exec_config_file(path: str) -> dict:
    """Load a python config file, resolving `_base_` includes recursively
    (child values win), mmcv-style."""
    with open(path) as f:
        src = f.read()
    ns: dict[str, Any] = {}
    exec(compile(src, path, "exec"), ns)
    merged: dict[str, Any] = {}
    base = ns.get("_base_")
    if base:
        bases = base if isinstance(base, (list, tuple)) else [base]
        for b in bases:
            parent = _exec_config_file(os.path.join(os.path.dirname(path), b))
            _deep_update(merged, parent)
    child = {k: v for k, v in ns.items()
             if not k.startswith("_") and k != "__builtins__"}
    _deep_update(merged, child)
    return merged


def _deep_update(dst: dict, src: dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


def apply_config_file(cfg: Config, path: str) -> Config:
    """Overlay a config file onto cfg (ref merge_hparams semantics,
    utils/params_utils.py:1-9: only keys the group already defines win)."""
    data = _exec_config_file(path)
    for group_name, attr in _GROUPS.items():
        overrides = data.get(group_name)
        if not overrides:
            continue
        group = getattr(cfg, attr)
        for k, v in overrides.items():
            if hasattr(group, k):
                setattr(group, k, v)
    return cfg


def add_args(parser: argparse.ArgumentParser, cfg: Config):
    """Expose every group field as a --flag (ref ParamGroup reflection,
    arguments/__init__.py:19-45)."""
    seen = set()
    for attr in _GROUPS.values():
        group = getattr(cfg, attr)
        for f in dataclasses.fields(group):
            if f.name in seen:
                continue
            seen.add(f.name)
            default = getattr(group, f.name)
            try:
                if isinstance(default, bool):
                    parser.add_argument(f"--{f.name}", default=None,
                                        action="store_true")
                elif isinstance(default, (dict, list)) or default is None:
                    continue
                else:
                    parser.add_argument(f"--{f.name}", default=None,
                                        type=type(default))
            except argparse.ArgumentError:
                pass  # flag already defined by the CLI itself
    return parser


def apply_args(cfg: Config, args: argparse.Namespace) -> Config:
    for attr in _GROUPS.values():
        group = getattr(cfg, attr)
        for f in dataclasses.fields(group):
            v = getattr(args, f.name, None)
            if v is not None:
                setattr(group, f.name, v)
    return cfg


def save_cfg(cfg: Config, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def load_cfg(path: str) -> Config:
    with open(path) as f:
        data = json.load(f)
    cfg = Config()
    for attr in _GROUPS.values():
        group = getattr(cfg, attr)
        for k, v in data.get(attr, {}).items():
            if hasattr(group, k):
                setattr(group, k, v)
    cfg.expname = data.get("expname", "")
    cfg.seed = data.get("seed", 6666)
    return cfg
