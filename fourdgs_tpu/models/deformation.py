"""Spatio-temporal deformation network: HexPlane features -> MLP heads
producing per-Gaussian deltas at time t.

Behavioral contract from ref scene/deformation.py:16-231:
  hidden = feature_out(HexPlane(xyz_norm, t))
  dx/ds/dr (+do/dshs when enabled) = head_i(hidden), heads are
  [ReLU, Linear(W,W), ReLU, Linear(W,out)]; deformed value = raw + delta
  (position: xyz + dx; rotation optionally quaternion-multiplied).

Parity notes:
  * feature_out is Linear(feat_dim, W) followed by (depth-1) x [ReLU,
    Linear(W,W)] — depth<=1 means a single Linear, no activation
    (ref deformation.py:45-60).
  * The reference computes positional encodings (poc_fre) of xyz/scales/
    rotations but the network only consumes raw xyz[:, :3] and t
    (ref deformation.py:67-83,198-211) — we skip the dead compute.
  * A `timenet` exists in the reference but is never called in the live
    forward path (ref deformation.py:199-204 commented out); we keep its
    parameters for optimizer-group parity (they ride the mlp group with
    zero gradient) so checkpoints enumerate the same groups.
  * Default ablation flags: no_do=True, no_dshs=True
    (ref arguments/__init__.py:95-100).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from fourdgs_tpu.models.hexplane import (HexPlaneConfig, hexplane_features,
                                         init_hexplane, normalize_aabb)
from fourdgs_tpu.ops.transforms import quat_multiply


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    net_width: int = 64
    defor_depth: int = 1
    grid: HexPlaneConfig = HexPlaneConfig()
    timenet_width: int = 64
    timenet_output: int = 32
    timebase_pe: int = 4
    no_dx: bool = False
    no_grid: bool = False
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = True
    no_dshs: bool = True
    apply_rotation: bool = False
    empty_voxel: bool = False
    static_mlp: bool = False
    sh_coeffs: int = 16  # (max_sh_degree+1)^2; shs head outputs sh_coeffs*3
    # Soft delta saturation: each head's delta passes through s*tanh(x/s)
    # (identity for |x| << s, hard-bounded by s). 0 disables = the
    # reference's unbounded deltas. Stability addition beyond the
    # reference: on multi-view scenes the unbounded scale/position deltas
    # admit a runaway (hexplane magnitude spikes -> e^4-sized splats ->
    # photometric loss kills all opacity -> permanent white-background
    # collapse; observed on synth_mv, fine-6000). Bounds in: world units
    # (dx), log-scale units (ds), quat units (dr).
    dx_bound: float = 0.0
    ds_bound: float = 0.0
    dr_bound: float = 0.0


def _linear_init(key, fan_in, fan_out):
    """xavier-uniform weight, torch-default uniform bias (ref
    deformation.py:218-223 applies xavier to weights; bias keeps torch's
    Linear default)."""
    wk, bk = jax.random.split(key)
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(wk, (fan_in, fan_out), minval=-limit, maxval=limit)
    bound = 1.0 / jnp.sqrt(fan_in)
    b = jax.random.uniform(bk, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _head_init(key, width, out_dim):
    k1, k2 = jax.random.split(key)
    return {"h0": _linear_init(k1, width, width),
            "h1": _linear_init(k2, width, out_dim)}


def _head_apply(p, x):
    x = jnp.maximum(x, 0.0)
    x = x @ p["h0"]["w"] + p["h0"]["b"]
    x = jnp.maximum(x, 0.0)
    return x @ p["h1"]["w"] + p["h1"]["b"]


def init_deform(key: jax.Array, cfg: DeformConfig) -> dict[str, Any]:
    """Returns {'grid': {...}, 'mlp': {...}} parameter pytree. The split
    mirrors the reference's two optimizer groups (grid vs deformation,
    ref gaussian_model.py:174-175)."""
    keys = jax.random.split(key, 16 + max(cfg.defor_depth, 1))
    w = cfg.net_width
    in_dim = 4 if cfg.no_grid else cfg.grid.feat_dim

    feature_out = {"fo0": _linear_init(keys[0], in_dim, w)}
    for i in range(cfg.defor_depth - 1):
        feature_out[f"fo{i+1}"] = _linear_init(keys[16 + i], w, w)

    times_ch = 2 * cfg.timebase_pe + 1
    mlp = {
        "feature_out": feature_out,
        "pos": _head_init(keys[5], w, 3),
        "scales": _head_init(keys[6], w, 3),
        "rotations": _head_init(keys[7], w, 4),
        "opacity": _head_init(keys[8], w, 1),
        "shs": _head_init(keys[9], w, cfg.sh_coeffs * 3),
        # dead-in-forward but kept for group parity (see module docstring)
        "timenet": {
            "t0": _linear_init(keys[2], times_ch, cfg.timenet_width),
            "t1": _linear_init(keys[3], cfg.timenet_width, cfg.timenet_output),
        },
    }
    if cfg.static_mlp:
        mlp["static"] = _head_init(keys[10], w, 1)
    out = {"grid": init_hexplane(keys[4], cfg.grid), "mlp": mlp}
    if cfg.empty_voxel:
        from fourdgs_tpu.models.dense_grid import init_dense_grid
        out["empty_voxel"] = init_dense_grid()
    return out


def _feature_out_apply(p, x, depth):
    x = x @ p["fo0"]["w"] + p["fo0"]["b"]
    for i in range(depth - 1):
        x = jnp.maximum(x, 0.0)
        x = x @ p[f"fo{i+1}"]["w"] + p[f"fo{i+1}"]["b"]
    return x


def deform_apply(
    params: dict[str, Any],
    cfg: DeformConfig,
    aabb: jnp.ndarray,        # (2, 3) rows (max, min)
    xyz: jnp.ndarray,         # (N, 3)
    scaling: jnp.ndarray,     # (N, 3) raw log-scales
    rotation: jnp.ndarray,    # (N, 4) raw quats
    opacity: jnp.ndarray,     # (N, 1) raw logits
    shs: jnp.ndarray,         # (N, K, 3)
    t: jnp.ndarray,           # () or (N,) timestamp
):
    """Apply the deformation field at time t. Returns deformed raw params
    (xyz, scaling, rotation, opacity, shs)."""
    n = xyz.shape[0]
    t = jnp.asarray(t, jnp.float32)
    if cfg.no_grid:
        feat = jnp.concatenate(
            [xyz, jnp.broadcast_to(t, (n,))[:, None]], axis=-1)
    else:
        pts_norm = normalize_aabb(xyz, aabb)
        feat = hexplane_features(params["grid"], cfg.grid, pts_norm, t)
    hidden = _feature_out_apply(params["mlp"]["feature_out"], feat,
                                max(cfg.defor_depth, 1))

    # masking path (ref deformation.py:99-104): static_mlp head, dense
    # empty-voxel grid, or identity ones
    if cfg.static_mlp:
        mask = _head_apply(params["mlp"]["static"], hidden)
    elif cfg.empty_voxel:
        from fourdgs_tpu.models.dense_grid import dense_grid_sample
        from fourdgs_tpu.models.hexplane import normalize_aabb as _na
        mask = dense_grid_sample(params["empty_voxel"], _na(xyz, aabb))
    else:
        mask = jnp.ones((n, 1))

    def bound(x, s):
        # soft saturation (see DeformConfig.dx_bound); s == 0 -> identity
        return jnp.tanh(x / s) * s if s else x

    out_xyz = xyz
    if not cfg.no_dx:
        out_xyz = xyz * mask + bound(
            _head_apply(params["mlp"]["pos"], hidden), cfg.dx_bound)
    out_scaling = scaling
    if not cfg.no_ds:
        out_scaling = (scaling * mask + bound(
            _head_apply(params["mlp"]["scales"], hidden), cfg.ds_bound))
    out_rotation = rotation
    if not cfg.no_dr:
        dr = bound(_head_apply(params["mlp"]["rotations"], hidden),
                   cfg.dr_bound)
        if cfg.apply_rotation:
            out_rotation = quat_multiply(rotation, dr)
        else:
            out_rotation = rotation + dr
    out_opacity = opacity
    if not cfg.no_do:
        out_opacity = (opacity * mask
                       + _head_apply(params["mlp"]["opacity"], hidden))
    out_shs = shs
    if not cfg.no_dshs:
        dshs = _head_apply(params["mlp"]["shs"], hidden)
        out_shs = shs * mask[..., None] + dshs.reshape(n, cfg.sh_coeffs, 3)
    return out_xyz, out_scaling, out_rotation, out_opacity, out_shs
