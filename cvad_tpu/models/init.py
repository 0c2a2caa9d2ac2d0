"""Torch-matching weight initializers.

The reference initializes explicitly for stability (SURVEY.md §2.3/2.4):
kaiming-normal fan_out convs, xavier-normal gain-0.5 or normal(0, 0.01)
dense layers, zero biases (``causal_anomaly_detection1.py:29-42``,
``minicausal_vad_complete3.py:76-88``).  Flax defaults (lecun_normal) differ,
which changes early training dynamics; these initializers reproduce the torch
schemes for flax kernel layouts (conv kernel (k..., I, O); dense (I, O)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_out(shape) -> int:
    # conv (k..., I, O): fan_out = O * prod(k); dense (I, O): fan_out = O
    if len(shape) <= 2:
        return shape[-1]
    receptive = math.prod(shape[:-2])
    return shape[-1] * receptive


def _fan_in(shape) -> int:
    if len(shape) <= 2:
        return shape[0]
    return shape[-2] * math.prod(shape[:-2])


def kaiming_normal_fan_out(nonlinearity: str = "relu", a: float = 0.0):
    """torch ``nn.init.kaiming_normal_(mode='fan_out')``."""
    if nonlinearity == "relu":
        gain = math.sqrt(2.0)
    elif nonlinearity == "leaky_relu":
        gain = math.sqrt(2.0 / (1 + a * a))
    else:
        gain = 1.0

    def init(key, shape, dtype=jnp.float32):
        std = gain / math.sqrt(_fan_out(shape))
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def xavier_normal(gain: float = 1.0):
    """torch ``nn.init.xavier_normal_``."""

    def init(key, shape, dtype=jnp.float32):
        std = gain * math.sqrt(2.0 / (_fan_in(shape) + _fan_out(shape)))
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def normal_std(std: float = 0.01):
    """torch ``nn.init.normal_(0, std)``."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init
