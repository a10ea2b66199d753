"""Shared NN building blocks (pure functions over param dicts).

One implementation each, shared by every model — the reference carries five
near-copies of its SASRec layer library (SASRecLayers.py, SASRecLayer.py,
SASRec_old.py:300-629, …); this module collapses them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.01):
    """tf.truncated_normal semantics (normal truncated at ±2σ)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def glorot_uniform(key, shape):
    """tf.glorot_uniform_initializer — the reference's default for
    ``tf.layers.Dense``/``Conv1D`` kernels and ``get_variable``.

    Fans follow TF's ``_compute_fans``: for rank>2 kernels the leading
    dims are the receptive field, multiplying both fans."""
    if len(shape) > 2:
        rf = 1
        for s in shape[:-2]:
            rf *= s
        fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
    elif len(shape) == 2:
        fan_in, fan_out = shape
    else:
        fan_in = fan_out = shape[0]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_layer_norm(dim):
    return {"beta": jnp.zeros((dim,)), "gamma": jnp.ones((dim,))}


def layer_norm(p, x, eps: float = 1e-8):
    """The reference's ``normalize`` (SASRecLayers.py:15-45): moments over the
    last axis, ε inside the sqrt."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return p["gamma"] * (x - mean) / jnp.sqrt(var + eps) + p["beta"]


def init_dense(key, d_in, d_out):
    return {"w": glorot_uniform(key, (d_in, d_out)), "b": jnp.zeros((d_out,))}


def dense(p, x):
    return x @ p["w"] + p["b"]


def dropout(key, x, rate: float, train: bool):
    """Inverted dropout (tf.layers.Dropout semantics)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
