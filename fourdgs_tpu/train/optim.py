"""Optimizer: Adam(eps=1e-15) with per-group learning rates + schedules.

Replicates the reference's eight optimizer groups and their LR treatment
(ref scene/gaussian_model.py:165-212): xyz/deformation/grid follow the
exponential schedule (stepped every iteration), f_dc/f_rest/opacity/scaling/
rotation are constant. The schedule is evaluated INSIDE the update (jnp), so
the whole optimizer step lives in one jitted function — no per-iteration
host work like the reference's update_learning_rate.

Densification needs optimizer surgery (moment resets for new/replaced
slots); `reset_moments_for_slots` edits the scale_by_adam state in place
(functional), mirroring ref cat_tensors_to_optimizer /
replace_tensor_to_optimizer semantics (scene/gaussian_model.py:316-388).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.ops.schedule import make_expon_lr
from fourdgs_tpu.train.config import OptimizationParams

GAUSS_LABELS = GaussianParams(
    xyz="xyz", features_dc="f_dc", features_rest="f_rest",
    scaling="scaling", rotation="rotation", opacity="opacity")


def param_labels(params: dict) -> dict:
    """Label pytree matching {'gauss': GaussianParams, 'deform': {...}}."""
    labels: dict[str, Any] = {"gauss": GAUSS_LABELS}
    if "deform" in params:
        labels["deform"] = {
            k: jax.tree.map(
                lambda _: "grid" if k == "grid" else "deformation", v)
            for k, v in params["deform"].items()
        }
    return labels


def build_schedules(opt: OptimizationParams, spatial_lr_scale: float
                    ) -> dict[str, Callable]:
    s = spatial_lr_scale
    const = lambda v: (lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), v))
    return {
        "xyz": make_expon_lr(opt.position_lr_init * s,
                             opt.position_lr_final * s,
                             lr_delay_mult=opt.position_lr_delay_mult,
                             max_steps=opt.position_lr_max_steps),
        "deformation": make_expon_lr(opt.deformation_lr_init * s,
                                     opt.deformation_lr_final * s,
                                     lr_delay_mult=opt.deformation_lr_delay_mult,
                                     max_steps=opt.position_lr_max_steps),
        "grid": make_expon_lr(opt.grid_lr_init * s, opt.grid_lr_final * s,
                              lr_delay_mult=opt.deformation_lr_delay_mult,
                              max_steps=opt.position_lr_max_steps),
        "f_dc": const(opt.feature_lr),
        "f_rest": const(opt.feature_lr / 20.0),
        "opacity": const(opt.opacity_lr),
        "scaling": const(opt.scaling_lr),
        "rotation": const(opt.rotation_lr),
    }


class GroupLrState(NamedTuple):
    count: jnp.ndarray


def scale_by_group_lr(schedules: dict[str, Callable], labels) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return GroupLrState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        # The reference sets lr(iteration) with iteration starting at 1
        # before each step (ref train.py:138).
        step = state.count + 1
        lrs = {k: fn(step) for k, fn in schedules.items()}
        new_updates = jax.tree.map(lambda g, lab: -lrs[lab] * g, updates,
                                   labels)
        return new_updates, GroupLrState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(opt: OptimizationParams, spatial_lr_scale: float,
                    params: dict) -> optax.GradientTransformation:
    schedules = build_schedules(opt, spatial_lr_scale)
    labels = param_labels(params)
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
        scale_by_group_lr(schedules, labels),
    )


def reset_moments_for_slots(opt_state, slot_mask: jnp.ndarray,
                            group: str | None = None):
    """Zero Adam moments of gaussian-buffer leaves at masked slots.

    group=None resets all six per-point tensors (densify); group="opacity"
    resets only the opacity moments (opacity reset,
    ref replace_tensor_to_optimizer scene/gaussian_model.py:316-329).
    """
    adam_state, lr_state = opt_state

    def reset(tree):
        def leaf(name):
            def fn(x):
                m = slot_mask.reshape((-1,) + (1,) * (x.ndim - 1))
                return jnp.where(m, 0.0, x)
            return fn
        gauss = tree["gauss"]
        new = {}
        for name in GaussianParams._fields:
            lbl = getattr(GAUSS_LABELS, name)
            x = getattr(gauss, name)
            if group is None or lbl == group:
                x = leaf(name)(x)
            new[name] = x
        return {**tree, "gauss": GaussianParams(**new)}

    adam_state = adam_state._replace(mu=reset(adam_state.mu),
                                     nu=reset(adam_state.nu))
    return (adam_state, lr_state)
