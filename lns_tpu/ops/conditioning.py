"""Conditioning blocks (reference: modules/cond_utils.py, from pdearena, MIT).

`zeros_init` replicates the reference's `zero_module` (ControlNet-style
zero-init gating, cond_utils.py:12-16); `CondResidualBlock` is the wide
residual block with additive or scale-shift (AdaGN) conditioning
(cond_utils.py:58-128).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from lns_tpu.ops.activations import get_activation
from lns_tpu.ops.conv import Conv1x1, ConvND, Dense
from lns_tpu.ops.norms import GroupNorm


def zeros_init_module(key, shape, dtype=jnp.float32):
    """zero_module equivalent: initializer producing zeros, used for the
    gated convolutions that must start as identity contributions."""
    return jnp.zeros(shape, dtype)


def embed_sequential(layers, x, emb):
    """EmbedSequential equivalent (reference: cond_utils.py:47-55): apply a
    sequence of callables, routing `emb` only to conditioned layers (those
    whose call signature takes two positional inputs)."""
    import inspect

    for layer in layers:
        fn = layer.__call__ if hasattr(layer, "__call__") else layer
        try:
            n_args = len(
                [p for p in inspect.signature(fn).parameters.values()
                 if p.default is inspect.Parameter.empty
                 and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                 and p.name != "self"]
            )
        except (TypeError, ValueError):
            n_args = 1
        x = layer(x, emb) if n_args >= 2 else layer(x)
    return x


class CondResidualBlock(nn.Module):
    """Wide residual block with conditioning vector injection.

    forward: h = conv1(act(norm1(x))); emb = cond_emb(emb);
    additive: h = conv2[zero-init](act(norm2(h + emb)));
    scale-shift: h = conv2(act(norm2(h)*(1+scale)+shift));
    out = h + shortcut(x). (reference: cond_utils.py:113-128)
    """

    in_channels: int
    out_channels: int
    cond_channels: int
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1
    use_scale_shift_norm: bool = False
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, emb):
        act = get_activation(self.activation)
        if self.norm:
            h = GroupNorm(self.n_groups, self.in_channels, eps=1e-5, name="norm1")(x)
        else:
            h = x
        h = ConvND(
            self.out_channels, 3, padding=1, padding_mode=self.padding_mode,
            dtype=self.dtype, name="conv1",
        )(act(h))
        emb_out = Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            name="cond_emb",
        )(emb)
        # broadcast [b, c] over spatial dims (channels-last)
        while emb_out.ndim < h.ndim:
            emb_out = emb_out[:, None]

        def conv2(y):
            # zero_module(conv2) in the reference: starts as a zero map so the
            # block begins as shortcut + conv1 path only (cond_utils.py:95).
            return ConvND(
                self.out_channels, 3, padding=1, padding_mode=self.padding_mode,
                kernel_init=zeros_init_module, bias_init=zeros_init_module,
                dtype=self.dtype, name="conv2",
            )(y)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if self.norm:
                h = GroupNorm(self.n_groups, self.out_channels, eps=1e-5, name="norm2")(h)
            h = h * (1 + scale) + shift
            h = conv2(act(h))
        else:
            h = h + emb_out
            if self.norm:
                h = GroupNorm(self.n_groups, self.out_channels, eps=1e-5, name="norm2")(h)
            h = conv2(act(h))

        if self.in_channels != self.out_channels:
            x = Conv1x1(self.out_channels, name="shortcut")(x)
        return h + x
