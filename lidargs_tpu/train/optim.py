"""Per-group Adam with schedule-driven learning rates.

Replaces the reference's torch.optim.Adam param groups + per-group LR
schedulers (gaussian_model.py:319-473). Hand-rolled (not optax) so the
moment buffers mirror the param dict one-to-one — densify/prune then edits
optimizer state with the same row scatter/gather as the params themselves,
replacing the reference's Adam "state surgery"
(cat_tensors_to_optimizer/_prune_anchor_optimizer, gaussian_model.py:551-674)
with pure array ops. Math matches torch.optim.Adam (eps added outside the
sqrt, bias correction on both moments).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import LrSchedule, OptConfig
from .schedule import const_lr, expon_lr

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


class AdamState(NamedTuple):
    mu: dict
    nu: dict
    count: jnp.ndarray


def lr_schedules(ocfg: OptConfig) -> Dict[str, Schedule]:
    """Top-level param key -> lr(step). 'frozen' groups get lr 0 (the
    reference freezes _rotation/_opacity via requires_grad_(False))."""
    zero = const_lr(0.0)
    return {
        "anchor": expon_lr(ocfg.anchor_lr),
        "offset": expon_lr(ocfg.offset_lr),
        "feat": const_lr(ocfg.feature_lr),
        "scaling": const_lr(ocfg.scaling_lr),
        "rotation": zero,
        "opacity": zero,
        "mlp_opacity": expon_lr(ocfg.mlp_opacity_lr),
        "mlp_cov": expon_lr(ocfg.mlp_cov_lr),
        # the reference drives the raydrop head with the color LR schedule
        # (gaussian_model.py:383,414-417)
        "mlp_color": expon_lr(ocfg.mlp_color_lr),
        "mlp_raydrop": expon_lr(ocfg.mlp_color_lr),
        "mlp_featbank": expon_lr(ocfg.mlp_featurebank_lr),
        "appearance": expon_lr(ocfg.appearance_lr),
        "appearance_rd": expon_lr(ocfg.appearance_lr),
    }


def init_adam(params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(
    params: dict,
    grads: dict,
    state: AdamState,
    schedules: Dict[str, Schedule],
    step: jnp.ndarray,
    ocfg: OptConfig,
    b1: float = 0.9,
    b2: float = 0.999,
):
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for key, p in params.items():
        lr = schedules[key](step)
        g, mu, nu = grads[key], state.mu[key], state.nu[key]

        def upd(p_, g_, mu_, nu_):
            mu2 = b1 * mu_ + (1 - b1) * g_
            nu2 = b2 * nu_ + (1 - b2) * g_ * g_
            step_ = lr * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + ocfg.adam_eps)
            return p_ - step_, mu2, nu2

        out = jax.tree.map(upd, p, g, mu, nu)
        # tree of tuples -> tuple of trees
        new_params[key] = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_mu[key] = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_nu[key] = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))

    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
