"""Tiny MLP heads as explicit param pytrees.

The reference uses 2-layer nn.Sequential heads (gaussian_model.py:113-141).
Plain dict params keep optax multi-transform labeling and densification-time
state surgery trivial (no framework module state to rebuild)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key, d_in: int, d_out: int):
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in)) for both
    weight and bias (parity with the reference's head initialization)."""
    kw, kb = jax.random.split(key)
    lim = 1.0 / jnp.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -lim, lim),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -lim, lim),
    }


def init_mlp(key, d_in: int, d_hidden: int, d_out: int):
    k1, k2 = jax.random.split(key)
    return {"l1": init_linear(k1, d_in, d_hidden), "l2": init_linear(k2, d_hidden, d_out)}


def apply_mlp(params, x: jnp.ndarray, final_act=None) -> jnp.ndarray:
    h = jax.nn.relu(x @ params["l1"]["w"] + params["l1"]["b"])
    y = h @ params["l2"]["w"] + params["l2"]["b"]
    return final_act(y) if final_act is not None else y
