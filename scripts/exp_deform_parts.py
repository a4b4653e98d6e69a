#!/usr/bin/env python
"""Decompose deform bwd+opt (~12 ms at the bench point): hexplane grid
backward vs MLP/head backward vs optimizer update. In-situ deltas
(30-step/one-sync): each variant stops gradients at a cut inside
deform_apply's input tree."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.models.deformation import deform_apply
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points, cap = 100_000, 131072
    cfg = Config(); cfg.hidden.multires = [1, 2]; cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cfg.raster = RasterParams(capacity=cap)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    dcfg = deform_config_from(cfg)
    gauss = st.params["gauss"]
    sg = jax.lax.stop_gradient

    def mk(cut, with_opt):
        def loss_fn(params, seed):
            d = params["deform"]
            if cut == "grid":      # only grid grads
                d = {**{k: sg(v) for k, v in d.items() if k != "grid"},
                     "grid": d["grid"]}
            elif cut == "mlp":     # only non-grid grads
                d = {**d, "grid": sg(d["grid"])}
            xyz, scaling, rotation, opacity, shs = deform_apply(
                d, dcfg, st.aabb, gauss.xyz + seed, gauss.scaling,
                gauss.rotation, gauss.opacity, gauss.features(),
                jnp.float32(0.5))
            # cheap consumer so blend/raster are OUT of the graph
            return (xyz.sum() + scaling.sum() + rotation.sum()
                    + opacity.sum() + shs.sum())

        @jax.jit
        def step(params, opt_state, seed):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, seed))(params)
            if with_opt:
                import optax
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return loss, params, opt_state
            return loss, grads, opt_state
        return step

    def t(name, f):
        o = jax.block_until_ready(f(st.params, st.opt_state, 0.0))
        t0 = time.perf_counter()
        for i in range(30):
            o = f(st.params, st.opt_state, float(i) * 1e-6)
        jax.block_until_ready(o)
        print(f"{name:36s} {(time.perf_counter()-t0)/30*1000:8.2f} ms",
              flush=True)

    t("deform fwd+bwd+opt (all)", mk("none", True))
    t("deform fwd+bwd (all, no opt)", mk("none", False))
    t("deform fwd+bwd grid-only", mk("grid", False))
    t("deform fwd+bwd mlp-only", mk("mlp", False))

    @jax.jit
    def fwd_only(params, seed):
        xyz, scaling, rotation, opacity, shs = deform_apply(
            params["deform"], dcfg, st.aabb, gauss.xyz + seed, gauss.scaling,
            gauss.rotation, gauss.opacity, gauss.features(), jnp.float32(0.5))
        return xyz.sum() + scaling.sum() + rotation.sum() + opacity.sum() + shs.sum()
    def fw(params, opt_state, seed):
        return fwd_only(params, seed)
    t("deform fwd only", fw)

if __name__ == "__main__":
    main()
