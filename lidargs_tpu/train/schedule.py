"""Learning-rate schedules (Plenoxels-style log-lerp, the reference's
get_expon_lr_func, utils/general_utils.py:30-63). jit-traceable."""
from __future__ import annotations

import jax.numpy as jnp

from ..config import LrSchedule


def expon_lr(s: LrSchedule):
    """Log-linear interpolation init->final over max_steps with optional
    sine-eased delay. Returns a jnp-traceable fn(step)->lr."""
    if s.init == 0.0 and s.final == 0.0:
        return lambda step: jnp.zeros((), jnp.float32)

    log_init = jnp.log(s.init)
    log_final = jnp.log(s.final)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if s.delay_steps > 0:
            delay = s.delay_mult + (1 - s.delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / s.delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / s.max_steps, 0.0, 1.0)
        lr = jnp.exp(log_init * (1 - t) + log_final * t)
        return jnp.where(step < 0, 0.0, delay * lr)

    return fn


def const_lr(value: float):
    return lambda step: jnp.asarray(value, jnp.float32)
