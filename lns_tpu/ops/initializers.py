"""Weight initializers matching PyTorch layer defaults.

Training-from-scratch parity with the reference requires the same init
*distributions* (not values): torch Conv/Linear default to
kaiming_uniform(a=sqrt(5)) for weights — which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for biases. Attention blocks in the reference re-init to N(0, 0.02)
(reference: modules/basics.py:358-369); spectral convs use
scale * U(0, 1) with scale = 1/(in*out) (modules/basics.py:118-124).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import random


def _conv_fan_in(shape):
    # HWIO layout: fan_in = prod(kernel spatial) * in_channels
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return receptive * shape[-2]


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) over HWIO conv kernels == U(-b, b) with
    b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)."""
    fan_in = _conv_fan_in(shape)
    bound = 1.0 / np.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch Linear default over (in, out)-shaped flax kernels."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in):
    return torch_conv_bias_init(fan_in)


def normal_init(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * random.normal(key, shape, dtype)

    return init


def uniform_scale_init(scale):
    """U(0, scale): the reference's spectral-conv weight init."""

    def init(key, shape, dtype=jnp.float32):
        return scale * random.uniform(key, shape, dtype)

    return init


def siren_init(fan_in, w0, c=6.0, is_first=False):
    """SIREN layer init (reference: modules/embedding.py:48-55)."""
    w_std = (1.0 / fan_in) if is_first else (np.sqrt(c / fan_in) / w0)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-w_std, maxval=w_std)

    return init
