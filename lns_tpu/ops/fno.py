"""FNO composite blocks (reference: modules/basics.py:531-715)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lns_tpu.ops.activations import get_activation, gelu
from lns_tpu.ops.conv import Conv1x1
from lns_tpu.ops.norms import GroupNorm, instance_norm_2d
from lns_tpu.ops.conditioning import zeros_init_module
from lns_tpu.ops.spectral import SpectralConv1d, SpectralConv2d, SpectralConv3d


def _spectral(in_ch, out_ch, modes, name):
    nd = len(modes)
    if nd == 1:
        return SpectralConv1d(in_ch, out_ch, modes[0], name=name)
    if nd == 2:
        return SpectralConv2d(in_ch, out_ch, modes[0], modes[1], name=name)
    if nd == 3:
        return SpectralConv3d(in_ch, out_ch, modes[0], modes[1], modes[2], name=name)
    raise ValueError("modes must have 1-3 entries")


class FourierBasicBlock(nn.Module):
    """SpectralConv + 1x1 conv bypass + activation, optional residual
    (reference: modules/basics.py:531-583)."""

    in_planes: int
    planes: int
    modes: Sequence[int]
    activation: str = "gelu"
    residual: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        x1 = _spectral(self.in_planes, self.planes, list(self.modes), "fourier")(x)
        x2 = Conv1x1(self.planes, name="conv")(x)
        out = act(x1 + x2)
        if self.residual:
            out = x + out
        return out


class ResFNOMixerBlock(nn.Module):
    """Metaformer-style: norm -> SpectralConv token mixer -> 1x1 MLP channel
    mixer, residual (reference: modules/basics.py:587-661). Library option
    (dead in shipped configs)."""

    in_channels: int
    out_channels: int
    modes: Sequence[int]
    norm: str = "in"  # 'in' | 'ln' | 'none'
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = x
        if self.norm == "in":
            h = instance_norm_2d(h)
        elif self.norm == "ln":
            h = GroupNorm(1, self.in_channels, eps=1e-5, name="norm")(h)
        h = _spectral(self.in_channels, self.out_channels, list(self.modes), "token_mixer")(h)
        h = GroupNorm(1, self.out_channels, eps=1e-5, name="cm_norm")(h)
        h = Conv1x1(self.out_channels, name="cm_fc1")(h)
        h = gelu(h)
        h = Conv1x1(self.out_channels, name="cm_fc2")(h)
        if self.in_channels != self.out_channels:
            x = Conv1x1(self.out_channels, name="channel_up")(x)
        return x + h


class CondResFNOMixerBlock(nn.Module):
    """Conditioned mixer: cond MLP (zero-init gate) scales the channel-mixer
    input x * (1 + cond) (reference: modules/basics.py:664-715). 2D only."""

    in_channels: int
    out_channels: int
    modes: Sequence[int]
    norm: str = "in"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, cond_emb):
        # broadcast cond [b, c] over spatial (channels-last)
        while cond_emb.ndim < x.ndim:
            cond_emb = cond_emb[:, None]
        gate = Conv1x1(self.in_channels, name="cond_fc1")(cond_emb)
        gate = gelu(gate)
        gate = Conv1x1(
            self.in_channels, kernel_init=zeros_init_module,
            bias_init=zeros_init_module, name="cond_fc2",
        )(gate)

        h = x
        if self.norm == "in":
            h = instance_norm_2d(h)
        elif self.norm == "ln":
            h = GroupNorm(1, self.in_channels, eps=1e-5, name="norm")(h)
        h = _spectral(self.in_channels, self.out_channels, list(self.modes), "token_mixer")(h)
        h = h * (1.0 + gate)
        h = GroupNorm(1, self.out_channels, eps=1e-5, name="cm_norm")(h)
        h = Conv1x1(self.out_channels, name="cm_fc1")(h)
        h = gelu(h)
        h = Conv1x1(self.out_channels, name="cm_fc2")(h)
        if self.in_channels != self.out_channels:
            x = Conv1x1(self.out_channels, name="channel_up")(x)
        return x + h
