#!/usr/bin/env python
"""Ablation timing of the bench train step (honest 30-step/one-sync).

Microbenchmarks of individual stages carry a multi-ms dispatch floor on
the axon tunnel; this measures in-situ deltas instead: each variant is
the FULL bench step with one piece removed/replaced, so the difference
to the full step is that piece's true pipelined cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops import losses
    from fourdgs_tpu.render.render import render
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points = 100_000
    size = 800
    cap = 131072
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.raster = RasterParams(capacity=cap, tile_size=32, tile_cap=512,
                              pair_cap=1 << 21, chunk=32, backend="auto",
                              bin_pairs_per_chunk=18432)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    raster_cfg = loop.raster_config_from(cfg, size, size)
    deform_cfg = deform_config_from(cfg)
    camera = _look_at_camera()
    cameras = jax.tree.map(lambda x: x[None], camera)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)

    def bench(name, fn, state, iters=30):
        state2, aux = fn(state)
        jax.block_until_ready(aux)
        for _ in range(3):
            state2, aux = fn(state2)
        jax.block_until_ready(aux)
        t0 = time.perf_counter()
        s = state2
        for _ in range(iters):
            s, aux = fn(s)
        jax.block_until_ready(aux)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {dt:8.2f} ms/step", flush=True)
        return dt

    def full(stage="fine", track=True):
        def f(s):
            s, aux = loop.train_step(
                s, cameras, gts, bg, stage=stage, active_sh=3,
                raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
                lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
                track_stats=track)
            return s, aux.loss
        return jax.jit(f)

    # variant: gradient-only (no optimizer update / state writes)
    @jax.jit
    def grad_only(s):
        def loss_fn(params, ndc):
            def render_one(cam):
                return render(params["gauss"], params["deform"], cam, bg,
                              raster_cfg, deform_cfg, s.aabb, s.alive,
                              3, stage="fine", ndc_offset=ndc)
            outs = jax.vmap(render_one)(cameras)
            l1 = losses.l1_loss(outs.color, gts)
            return l1, outs.color
        ndc = jnp.zeros((cap, 2))
        (l, img), g = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                         has_aux=True)(s.params, ndc)
        # fold grads into a scalar so nothing is DCE'd but no state update
        tot = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return s, l + 0.0 * tot

    # variant: forward only
    @jax.jit
    def fwd_only(s):
        def render_one(cam):
            return render(s.params["gauss"], s.params["deform"], cam, bg,
                          raster_cfg, deform_cfg, s.aabb, s.alive,
                          3, stage="fine")
        outs = jax.vmap(render_one)(cameras)
        return s, losses.l1_loss(outs.color, gts)

    t_full = bench("FULL fine (track_stats)", full(), st)
    t_notrk = bench("fine, track_stats=False", full(track=False), st)
    t_coarse = bench("coarse (no deform)", full("coarse"), st)
    t_grad = bench("fwd+bwd only (no optimizer)", grad_only, st)
    t_fwd = bench("fwd only", fwd_only, st)
    print()
    print(f"track_stats cost : {t_full - t_notrk:7.2f} ms")
    print(f"deform cost      : {t_full - t_coarse:7.2f} ms (fwd+bwd+reg)")
    print(f"optimizer+state  : {t_full - t_grad:7.2f} ms")
    print(f"backward total   : {t_grad - t_fwd:7.2f} ms")
    print(f"forward total    : {t_fwd:7.2f} ms")


if __name__ == "__main__":
    main()
