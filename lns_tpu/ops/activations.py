"""Activations (reference: modules/basics.py:10-29)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swish(x):
    """x * sigmoid(x) (reference Swish, modules/basics.py:27-29)."""
    return x * jax.nn.sigmoid(x)


def gelu(x):
    # torch nn.GELU default is the exact (erf) formulation.
    return jax.nn.gelu(x, approximate=False)


ACTIVATION_REGISTRY = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "gelu": gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(name: str):
    if name not in ACTIVATION_REGISTRY:
        raise NotImplementedError(f"Activation {name} not implemented")
    return ACTIVATION_REGISTRY[name]
