"""Differentiable-parameter handling.

The radiance estimate is differentiable w.r.t. the continuous appearance
parameters of the scene — material colors/roughness and light emission
(the reference is a non-differentiable forward renderer; this subsystem is
the new capability BASELINE.json's north star requires). Sampling decisions
are detached inside the integrator (see models/integrators.py), so gradients
flow through the f/Li/emission weights only — the standard detached-sampling
reparameterization.

`Params` is just a dict of leaf arrays split out of ScenePack so optimizers
(optax) can treat it as the trainable pytree while the geometry stays
frozen.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ScenePack fields that are legitimate optimization targets.
DIFFERENTIABLE_FIELDS = (
    "mat_c0", "mat_c1", "mat_s0", "mat_s1", "light_c", "tex_image",
)


def get_params(pack, fields=DIFFERENTIABLE_FIELDS) -> dict:
    return {f: getattr(pack, f) for f in fields}


def with_params(pack, params: dict):
    return pack._replace(**params)


def loss_fn(render_fn, pack, target):
    """Mean-squared-error image loss as a function of the trainable params.

    render_fn: pack -> [H,W,3] (e.g. models.render.render_fn's fn).
    Returns loss(params) suitable for jax.grad / optax.
    """

    def loss(params):
        img = render_fn(with_params(pack, params))
        return jnp.mean((img - target) ** 2)

    return loss


def fit(render_fn, pack, target, fields=("mat_c0",), steps: int = 50,
        lr: float = 0.05):
    """Simple gradient-descent fit of scene parameters to a target image.
    Returns (params, losses). Uses plain SGD with projection onto [0, inf)
    to keep colors physical; swap in optax for fancier schedules."""
    params = get_params(pack, fields)
    loss = loss_fn(render_fn, pack, target)
    vg = jax.jit(jax.value_and_grad(loss))
    losses = []
    for _ in range(steps):
        val, g = vg(params)
        losses.append(float(val))
        params = {
            k: jnp.maximum(params[k] - lr * g[k], 0.0) for k in params
        }
    return params, losses
