"""Benchmark: training-step throughput (rays/s, forward+backward) on one chip.

Protocol: fine-stage training steps (HexPlane deformation + SH + tiled
differentiable rasterizer + Adam) on a synthetic scene at D-NeRF geometry
(800x800 image, batch 1, ~100k alive gaussians — the reference's typical
operating point, its densification runs up to 360k, ref train.py:270).
rays/s = H * W * steps / wall_time, matching the "rendered rays/s per chip
fwd+bwd" north star in BASELINE.json.

Baseline derivation (vs_baseline): the reference trains D-NeRF in 8 min on
an RTX 3090 (ref README.md:37) over 3000 coarse + 20000 fine iterations at
800x800 batch 1 => 23000 steps / 480 s ~= 47.9 steps/s * 640k rays
~= 30.7M rays/s forward+backward. vs_baseline = ours / 30.7e6.

Prints ONE JSON line. Env knobs: BENCH_STEPS, BENCH_POINTS, BENCH_SIZE.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_RAYS_PER_S = 23000 / 480.0 * 800 * 800  # reference, RTX 3090


def main():
    import jax

    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    steps = int(os.environ.get("BENCH_STEPS", 30))
    n_points = int(os.environ.get("BENCH_POINTS", 100_000))
    size = int(os.environ.get("BENCH_SIZE", 800))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    cfg = Config()
    # headline-scene hyperparameters: the D-NeRF per-scene config
    # (multires [1,2], depth 0, width 64 — ref arguments/dnerf/dnerf_default.py)
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    # default capacity = the bucket training would pick at these points
    # (pow2 up to 64k, 64k multiples above — loop.pick_bucket); headroom 1
    # because the bench population is fixed
    cap = int(os.environ.get("BENCH_CAP", 0)) or loop.pick_bucket(
        n_points, 1 << 22, headroom=1.0)
    tile = int(os.environ.get("BENCH_TILE", RasterParams.tile_size))
    bin_chunk = int(os.environ.get("BENCH_BIN_CHUNK", 4096))
    bin_pc = int(os.environ.get(
        "BENCH_BIN_PC",
        (18432 if tile == 32 else 32768) * (bin_chunk // 4096)))
    # Defaults are the DROP-FREE operating point (VERDICT r4 #4): global
    # pair budget 32*18432 covers every pair and tile_cap 512 leaves zero
    # effective tile drops (excess only behind fully saturated pixels).
    # tile_cap 256 runs ~7% faster with 0.5% of pairs dropped in
    # unsaturated tiles — that capped variant is a secondary datapoint,
    # not the headline.
    cfg.raster = RasterParams(capacity=cap, tile_size=tile,
                              tile_cap=int(os.environ.get(
                                  "BENCH_TILE_CAP", 512)),
                              pair_cap=1 << 21,
                              chunk=int(os.environ.get("BENCH_CHUNK", 32)),
                              backend=backend,
                              bin_chunk=bin_chunk,
                              bin_pairs_per_chunk=bin_pc,
                              fuse_pack=os.environ.get(
                                  "BENCH_FUSE_PACK", "0") != "0")
    pts, cols = _synthetic_scene(n_points)
    # compact spatial distribution so tile occupancy resembles a real scene
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    # trained-like opacity: converged scenes are opacity-pruned to mostly
    # opaque survivors (ref prunes below 0.005, train.py:274-277), and
    # per-pixel saturation is what bounds effective blend depth — benching
    # at the 0.1 INIT opacity measures an unrealistically translucent
    # workload (effective tile drops 344k vs 9k at the same geometry).
    op = float(os.environ.get("BENCH_OPACITY", 0.9))
    logit = float(np.log(op / (1.0 - op)))
    gauss = st.params["gauss"]._replace(
        opacity=jnp.full_like(st.params["gauss"].opacity, logit))
    st = st._replace(params={**st.params, "gauss": gauss})
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))

    raster_cfg = loop.raster_config_from(cfg, size, size)
    deform_cfg = deform_config_from(cfg)
    camera = _look_at_camera()
    cameras = jax.tree.map(lambda x: x[None], camera)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)

    def step(state):
        return loop.train_step(
            state, cameras, gts, bg, stage="fine", active_sh=3,
            raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
            lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
            track_stats=True)

    # warmup / compile (hard host syncs — see note below)
    st, aux = step(st)
    float(aux.loss)
    for _ in range(3):
        st, aux = step(st)
    float(aux.loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        st, aux = step(st)
    # hard host sync: on the axon-tunneled backend block_until_ready can
    # return early (see scripts/_timing.py); a device->host value pull of a
    # loop-dependent scalar cannot
    final_loss = float(aux.loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    rays_per_s = size * size * steps / dt
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip_fwd_bwd",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
        "detail": {
            "steps": steps, "seconds": round(dt, 3),
            "steps_per_s": round(steps / dt, 3),
            "points": n_points, "image": size, "backend": backend,
            # overflow honesty (disjoint counters): dropped_pairs = pairs
            # beyond the per-chunk pair budget, dropped_tile = pairs beyond
            # the per-tile cap, on the LAST step; 0/0 = drop-free
            "dropped_pairs": int(aux.dropped_pairs),
            "dropped_tile": int(aux.dropped_tile),
            "device": str(jax.devices()[0]),
            "baseline_rays_per_s": round(BASELINE_RAYS_PER_S, 1),
        },
    }))


if __name__ == "__main__":
    main()
