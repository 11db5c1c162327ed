"""Residual and resampling blocks (reference: modules/basics.py:224-328 and
modules/autoencoder2d_half_periodic.py:55-103).

All blocks are N-D capable where the reference's are (ResidualBlock,
Up/DownSampleBlock support 1/2/3 spatial dims) and channels-last.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from lns_tpu.ops.activations import swish
from lns_tpu.ops.conv import Conv1x1, ConvND, HalfPeriodicConv2d
from lns_tpu.ops.norms import GroupNorm
from lns_tpu.ops.padding import pad_nd


class ResidualBlock(nn.Module):
    """Pre-norm residual block: GN(32)->swish->conv3->GN->swish->conv3 with a
    1x1 `channel_up` shortcut when channels change
    (reference: modules/basics.py:224-276)."""

    in_channels: int
    out_channels: int
    num_dimensions: int = 2
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(32, self.in_channels, name="gn1")(x)
        h = swish(h)
        h = ConvND(
            self.out_channels,
            3,
            num_dimensions=self.num_dimensions,
            padding=1,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="conv1",
        )(h)
        h = GroupNorm(32, self.out_channels, name="gn2")(h)
        h = swish(h)
        h = ConvND(
            self.out_channels,
            3,
            num_dimensions=self.num_dimensions,
            padding=1,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="conv2",
        )(h)
        if self.in_channels != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype, name="channel_up")(x)
        return x + h


class UpSampleBlock(nn.Module):
    """nearest x2 + conv3 (reference: modules/basics.py:279-299)."""

    channels: int
    num_dimensions: int = 2
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # nearest-2x + conv fused into one lhs-dilated conv on the small
        # grid (ConvND.upsample_2x; measured 2.7x faster than
        # materializing the upsampled activation — probe_upsample.py)
        return ConvND(
            self.channels,
            3,
            num_dimensions=self.num_dimensions,
            padding=1,
            padding_mode=self.padding_mode,
            upsample_2x=True,
            dtype=self.dtype,
            name="conv",
        )(x)


class DownSampleBlock(nn.Module):
    """Stride-2 conv3 with the reference's padding arithmetic
    (modules/basics.py:302-328): circular mode pads (1, 1) per axis, zeros
    mode pads asymmetric (0, 1) — this is what makes 61 -> 30 -> 15 -> 7
    halving work for the two-phase grids."""

    channels: int
    num_dimensions: int = 2
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nd = self.num_dimensions
        if self.padding_mode == "circular":
            x = pad_nd(x, [(1, 1)] * nd, mode="circular")
        else:
            x = pad_nd(x, [(0, 1)] * nd, mode="zeros")
        return ConvND(
            self.channels,
            3,
            num_dimensions=nd,
            stride=2,
            padding=0,
            dtype=self.dtype,
            name="conv",
        )(x)


class HalfPeriodicResBlock2d(nn.Module):
    """Residual block built from half-periodic convs (reference:
    modules/autoencoder2d_half_periodic.py:77-103)."""

    in_channels: int
    out_channels: int
    periodic_direction: str = "x"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.in_channels != self.out_channels:
            x_skip = Conv1x1(self.out_channels, dtype=self.dtype, name="channel_up")(x)
        else:
            x_skip = x
        h = GroupNorm(32, self.in_channels, name="gn1")(x)
        h = swish(h)
        h = HalfPeriodicConv2d(
            self.out_channels, 3, padding=1, periodic_direction=self.periodic_direction,
            dtype=self.dtype, name="conv1",
        )(h)
        h = GroupNorm(32, self.out_channels, name="gn2")(h)
        h = swish(h)
        h = HalfPeriodicConv2d(
            self.out_channels, 3, padding=1, periodic_direction=self.periodic_direction,
            dtype=self.dtype, name="conv2",
        )(h)
        return h + x_skip


class DownSampleBlock2dHalfPeriodic(nn.Module):
    """Half-periodic stride-2 downsample, symmetric pad 1 (reference:
    modules/autoencoder2d_half_periodic.py:68-74)."""

    channels: int
    periodic_direction: str = "x"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return HalfPeriodicConv2d(
            self.channels, 3, stride=2, padding=1,
            periodic_direction=self.periodic_direction, dtype=self.dtype, name="conv",
        )(x)


class UpSampleBlock2dHalfPeriodic(nn.Module):
    """Half-periodic nearest x2 + conv3 (reference:
    modules/autoencoder2d_half_periodic.py:55-65)."""

    channels: int
    periodic_direction: str = "x"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return HalfPeriodicConv2d(
            self.channels, 3, padding=1,
            periodic_direction=self.periodic_direction, upsample_2x=True,
            dtype=self.dtype, name="conv",
        )(x)
