"""Multi-resolution HexPlane (K-Planes) spatio-temporal feature field.

Six 2D planes per scale over coordinate pairs of (x, y, z, t), bilinear
sampling with border clamp, per-scale feature product, cross-scale concat —
the behavioral contract of ref scene/hexplane.py:21-183. Written as pure jnp
gather+lerp (TPU-friendly: 4 row gathers + fused FMA per plane; no
grid_sample op needed).

Plane index convention (itertools.combinations of 4 coords, ref
hexplane.py:58): 0=(x,y) 1=(x,z) 2=(x,t) 3=(y,z) 4=(y,t) 5=(z,t);
spatial planes = {0,1,3}, time planes = {2,4,5}. Plane `ci` over coords
(a, b) is stored (reso_b, reso_a, C): first coord indexes the width axis.

Reference quirks kept for parity:
  * aabb rows are (max, min), so normalize maps max->-1, min->+1
    (ref hexplane.py:19-20,152-157)
  * timestamps are NOT aabb-normalized; t in [0,1] samples only half the
    [-1,1] time-grid extent (ref hexplane.py:160-164)
  * multires multipliers scale only the three spatial resolutions
    (ref hexplane.py:128-134)
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Any

import jax
import jax.numpy as jnp

COO_COMBS = tuple(itertools.combinations(range(4), 2))
SPACE_PLANES = (0, 1, 3)
TIME_PLANES = (2, 4, 5)


@dataclasses.dataclass(frozen=True)
class HexPlaneConfig:
    resolution: tuple[int, int, int, int] = (64, 64, 64, 25)
    out_dim: int = 32
    multires: tuple[int, ...] = (1, 2, 4, 8)
    init_a: float = 0.1
    init_b: float = 0.5
    # Use the constant-time MXU fast path for time planes when t is scalar
    # (bilinear_sample_const_v). Static config — baked in at trace time;
    # disable to force the generic gather sampler (e.g. for A/B timing).
    const_t: bool = True

    @property
    def feat_dim(self) -> int:
        return self.out_dim * len(self.multires)


def init_hexplane(key: jax.Array, cfg: HexPlaneConfig) -> dict[str, Any]:
    """Returns {'l{level}_p{ci}': (reso_b, reso_a, C)} parameter pytree.
    Spatial planes uniform(a, b); time planes ones (ref hexplane.py:60-68)."""
    grids = {}
    for lvl, mult in enumerate(cfg.multires):
        reso = [r * mult for r in cfg.resolution[:3]] + [cfg.resolution[3]]
        for ci, (a, b) in enumerate(COO_COMBS):
            key, sub = jax.random.split(key)
            shape = (reso[b], reso[a], cfg.out_dim)
            if 3 in (a, b):
                grids[f"l{lvl}_p{ci}"] = jnp.ones(shape)
            else:
                grids[f"l{lvl}_p{ci}"] = jax.random.uniform(
                    sub, shape, minval=cfg.init_a, maxval=cfg.init_b)
    return grids


@jax.custom_vjp
def _gather_rows(packed: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """packed[idx] with a swappable backward.

    The default backward is XLA's scatter-add (fuses with the surrounding
    autodiff graph). FOURDGS_HEX_BWD=pallas routes the backward through
    the serial Mosaic scatter_add_rows kernel when the corner table fits
    VMEM — the spatial-plane scatters are ~7.6 ms of the 42 ms bench step
    (exp_r5_hex), and the kernel measured 2.3 vs 3.27 ms standalone at
    the (16384, 128) level-1 table in r4 (exp_scatter_r4); kept opt-in
    pending an in-graph win (prior Pallas scatters in the BLEND backward
    broke XLA fusion and regressed the step — see PLAN.md negatives)."""
    return packed[idx]


def _gather_rows_fwd(packed, idx):
    return packed[idx], (idx, packed.shape[0])


def _gather_rows_bwd(res, g):
    import os
    idx, n_rows = res
    w = g.shape[-1]
    use_pallas = (os.environ.get("FOURDGS_HEX_BWD") == "pallas"
                  and jax.default_backend() == "tpu"
                  and w % 128 == 0 and n_rows * w * 4 <= 12 << 20)
    if use_pallas:
        from fourdgs_tpu.ops.pallas.scatter import scatter_add_rows
        gp = scatter_add_rows(idx, g, n_out=n_rows)
    else:
        gp = jnp.zeros((n_rows, w), g.dtype).at[idx].add(g)
    return gp, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def normalize_aabb(pts: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """aabb (2,3) rows (max, min); maps max->-1, min->+1 (reference quirk)."""
    return (pts - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0


def bilinear_sample(plane: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) plane at coords u (width), v (height) in [-1, 1],
    align_corners=True with border clamp. Returns (N, C).

    Corner-packed single gather: TPU gathers/scatters cost is per ROW, not
    per byte, so the plane is first expanded (dense shifts, ~free) into a
    (H*W, 4C) table whose row (y, x) holds all four bilinear corners; one
    wide row gather then replaces four narrow ones (4x fewer rows moved on
    the fwd; the autodiff backward likewise becomes ONE row scatter-add
    into the packed table plus dense shift-adds). Measured on v5e: hexplane
    fwd+bwd 68 ms -> ~15 ms at 131k points. Earlier losers kept for the
    record: vmap'd (2,2,C) dynamic_slice (100x slower), concatenated
    4N-row gather custom VJP (15% slower than the 4-gather baseline)."""
    h, w, c = plane.shape
    x = jnp.clip((u + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    y = jnp.clip((v + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    # packed corners: [:, :c]=p(y,x) [:, c:2c]=p(y,x+1) (edge-clamped),
    # rows 2c:4c are the same pair one row down
    row_pair = jnp.concatenate(
        [plane, jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)],
        axis=-1)
    packed = jnp.concatenate(
        [row_pair, jnp.concatenate([row_pair[1:], row_pair[-1:]], axis=0)],
        axis=-1).reshape(h * w, 4 * c)
    # (A sort+sorted-segment-sum backward for this gather measured SLOWER
    # in-graph: 13.4M -> 10.9M rays/s — the autodiff scatter-add fuses
    # with the surrounding backward while the sort variant serializes.)
    r = _gather_rows(packed, y0 * w + x0)
    top = r[:, :c] * (1 - fx) + r[:, c:2 * c] * fx
    bot = r[:, 2 * c:3 * c] * (1 - fx) + r[:, 3 * c:] * fx
    return top * (1 - fy) + bot * fy


def bilinear_sample_const_v(plane: jnp.ndarray, u: jnp.ndarray,
                            v: jnp.ndarray) -> jnp.ndarray:
    """bilinear_sample for a SCALAR v coordinate (same math, same clamping).

    Training renders one camera at one timestamp, so the three time planes
    per level sample at a constant time row. That collapses the v lerp to a
    2-row dynamic slice, and the remaining 1D x interpolation is done as a
    one-hot matmul on the MXU instead of a row gather: the autodiff
    backward then becomes onehot^T @ grad — a small matmul — rather than an
    N-row scatter-add into the plane (XLA scatters run at ~62M rows/s on
    v5e; 6 time-plane scatters were ~8 ms of the 100k-point train step).
    one_hot rows are exact in any dtype and HIGHEST precision keeps the
    accumulation f32-faithful."""
    h, w, c = plane.shape
    y = jnp.clip((v + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
    y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), max(h - 2, 0))
    fy = y - y0
    rows = jax.lax.dynamic_slice(plane, (y0, 0, 0), (min(2, h), w, c))
    row = (rows[0] * (1.0 - fy) + rows[-1] * fy)        # (w, c)
    # mini[x] = [row[x], row[min(x+1, w-1)]]: both bilinear x-corners
    mini = jnp.concatenate(
        [row, jnp.concatenate([row[1:], row[-1:]], axis=0)], axis=-1)
    x = jnp.clip((u + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    fx = (x - x0)[:, None]
    oh = jax.nn.one_hot(x0, w, dtype=plane.dtype)       # (N, w)
    r = jnp.matmul(oh, mini, precision=jax.lax.Precision.HIGHEST)
    return r[:, :c] * (1.0 - fx) + r[:, c:] * fx


def hexplane_features(
    grids: dict[str, jnp.ndarray],
    cfg: HexPlaneConfig,
    pts_norm: jnp.ndarray,   # (N, 3) in [-1, 1]
    t: jnp.ndarray,          # () or (N,) raw timestamps (in [0, 1])
) -> jnp.ndarray:
    """(N, feat_dim): per-level product over 6 planes, concat over levels.

    A scalar t (the per-camera timestamp — the training/render case) takes
    the constant-time fast path for the three time planes per level; a
    per-point t array falls back to the generic gather sampler."""
    t_scalar = jnp.ndim(t) == 0 and cfg.const_t
    coords = pts_norm if t_scalar else jnp.concatenate(
        [pts_norm, jnp.broadcast_to(t, pts_norm.shape[:1])[:, None]],
        axis=-1)
    outs = []
    for lvl in range(len(cfg.multires)):
        prod = None
        for ci, (a, b) in enumerate(COO_COMBS):
            plane = grids[f"l{lvl}_p{ci}"]
            if t_scalar and b == 3:
                s = bilinear_sample_const_v(plane, coords[:, a], t)
            else:
                s = bilinear_sample(plane, coords[:, a], coords[:, b])
            prod = s if prod is None else prod * s
        outs.append(prod)
    return jnp.concatenate(outs, axis=-1)
