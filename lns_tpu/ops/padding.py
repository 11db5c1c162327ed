"""Spatial padding utilities (NHWC / channels-last, N-D).

Implements the three boundary topologies the reference's conv stacks use:
  * zeros            — torch padding_mode='zeros'
  * circular         — torch padding_mode='circular' (wrap)
  * half-periodic    — circular along one axis, zeros along the other
                       (reference: modules/autoencoder2d_half_periodic.py:26-52)

Padding amounts are (lo, hi) pairs per spatial axis so the asymmetric
(0, 1) pad of the reference's DownSampleBlock (modules/basics.py:317-327)
is expressible.

Layout convention: arrays are [B, *spatial, C]; spatial axes are
1 .. ndim-2 in order (H, W, ...) matching torch's (N, C, H, W) spatial order.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

Pad2 = Tuple[int, int]


def pad_nd(x, pads: Sequence[Pad2], mode: str = "zeros"):
    """Pad the spatial axes of an NHWC-style array.

    Args:
      x: [B, *spatial, C]
      pads: one (lo, hi) pair per spatial axis, in (H, W, ...) order.
      mode: 'zeros' | 'circular'
    """
    cfg = [(0, 0)] + list(pads) + [(0, 0)]
    if mode == "zeros" or mode == "constant":
        return jnp.pad(x, cfg, mode="constant")
    if mode == "circular":
        return jnp.pad(x, cfg, mode="wrap")
    raise ValueError(f"unknown padding mode {mode}")


def pad_half_periodic(x, pad: int, periodic_direction: str = "x"):
    """Circular pad along the periodic axis, zero pad along the other.

    In the reference's NCHW convention the last axis is 'x' (width) and the
    second-to-last is 'y' (height); here spatial axes are (H, W) = (y, x).
    Matches HalfPeriodicConv2d.pad: circular first along the periodic axis,
    then constant along the other (order is irrelevant for correctness).
    """
    if periodic_direction == "x":
        x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (0, 0)], mode="wrap")
        x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0), (0, 0)], mode="constant")
    elif periodic_direction == "y":
        x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0), (0, 0)], mode="wrap")
        x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (0, 0)], mode="constant")
    else:
        raise ValueError("periodic_direction must be x or y")
    return x
