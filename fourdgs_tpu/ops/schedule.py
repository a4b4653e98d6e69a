"""Learning-rate schedules.

Log-linear exponential decay with optional sine delay ramp, the Plenoxels/
JaxNeRF schedule the reference uses for xyz/deformation/grid params
(ref utils/general_utils.py:35-68). Implemented in jnp so it can live inside
a jitted train step (the reference recomputes it in Python each iteration).
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Returns the lr at `step` (array or python int)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def make_expon_lr(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                  max_steps=1000000):
    def fn(step):
        return expon_lr(step, lr_init, lr_final, lr_delay_steps,
                        lr_delay_mult, max_steps)
    return fn
