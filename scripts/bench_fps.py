#!/usr/bin/env python
"""Render-path FPS at the bench operating point (fwd only, fine stage:
deform + SH + projection + binner + blend), 100-frame loop with one hard
host sync — the reference's render.py FPS protocol (ref render.py:57-70)
applied to the synthetic bench scene. Prints one JSON line."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.render.render import render
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points = int(os.environ.get("BENCH_POINTS", 100_000))
    size = int(os.environ.get("BENCH_SIZE", 800))
    frames = int(os.environ.get("BENCH_FRAMES", 100))
    cap = 1 << (n_points - 1).bit_length()
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cfg.raster = RasterParams(
        capacity=cap, tile_size=32,
        tile_cap=int(os.environ.get("BENCH_TILE_CAP", 512)),
        pair_cap=1 << 21, chunk=32,
        bin_pairs_per_chunk=int(os.environ.get("BENCH_BIN_PC", 18432)))
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    gauss = st.params["gauss"]._replace(
        opacity=jnp.full_like(st.params["gauss"].opacity, 2.197))  # α=0.9
    raster_cfg = loop.raster_config_from(cfg, size, size)
    deform_cfg = deform_config_from(cfg)
    bg = jnp.zeros(3)

    @jax.jit
    def frame(camera, t):
        cam = camera._replace(time=t) if hasattr(camera, "_replace") else \
            camera
        out = render(gauss, st.params["deform"], cam, bg, raster_cfg,
                     deform_cfg, st.aabb, st.alive, 3, stage="fine")
        return out.color

    @jax.jit
    def frame_counters(camera, t, acc):
        cam = camera._replace(time=t) if hasattr(camera, "_replace") else \
            camera
        out = render(gauss, st.params["deform"], cam, bg, raster_cfg,
                     deform_cfg, st.aabb, st.alive, 3, stage="fine")
        return (jnp.maximum(acc[0], out.dropped_pairs),
                jnp.maximum(acc[1], out.dropped_tile))

    cam = _look_at_camera()
    img = frame(cam, jnp.float32(0.0))
    np.asarray(img[0, 0])
    t0 = time.perf_counter()
    for i in range(frames):
        img = frame(cam, jnp.float32(i / frames))
    np.asarray(img[0, 0])  # hard sync (axon timing caveat)
    dt = time.perf_counter() - t0
    fps = frames / dt
    # Overflow honesty, measured OUTSIDE the timed loop: materializing the
    # drop counters in the timed path defeats their DCE and costs ~2-4 ms
    # per frame, so the timed render matches deployment (color only) and a
    # second untimed pass over the SAME animation frames reports the max
    # drop counters the config would have incurred.
    acc = (jnp.int32(0), jnp.int32(0))
    for i in range(frames):
        acc = frame_counters(cam, jnp.float32(i / frames), acc)
    max_dp, max_dt = int(acc[0]), int(acc[1])
    print(json.dumps({
        "metric": "render_fps_fine", "value": round(fps, 2), "unit": "fps",
        "vs_baseline": round(fps / 82.0, 4),
        "detail": {"frames": frames, "seconds": round(dt, 3),
                   "ms_per_frame": round(dt / frames * 1000, 2),
                   "points": n_points, "image": size,
                   "max_dropped_pairs": max_dp,
                   "max_dropped_tile": max_dt,
                   "baseline_fps": 82.0,
                   "device": str(jax.devices()[0])}}))


if __name__ == "__main__":
    main()
