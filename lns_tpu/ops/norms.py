"""Normalization layers (NHWC / channels-last).

Matches torch semantics exactly:
  * GroupNorm(32, eps=1e-6) wrapper (reference: modules/basics.py:18-24)
  * GroupNorm(1, C) == per-sample layer norm over (spatial, C)
  * LayerNorm eps=1e-5 (torch default)
  * InstanceNorm2d: per-sample per-channel over spatial, no affine, eps=1e-5
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm over channels-last inputs [..., spatial..., C].

    Normalizes each group of channels over (all spatial dims, channel group)
    per sample — identical math to torch's NCHW GroupNorm.
    """

    num_groups: int
    channels: int
    eps: float = 1e-6
    use_affine: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        assert c == self.channels, f"GroupNorm expected {self.channels} channels, got {c}"
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        orig_dtype = x.dtype
        batch_shape = x.shape[:1]
        spatial = x.shape[1:-1]
        scale = bias = None
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if orig_dtype == jnp.float32:
            # two-pass form: numerically exact (golden f32 path)
            xg = x.reshape(batch_shape + (-1, g, c // g))  # [B, S, G, C/G]
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
            xg = (xg - mean) / jnp.sqrt(var + self.eps)
            out = xg.reshape(batch_shape + spatial + (c,))
            if self.use_affine:
                out = out * scale + bias
            return out
        # Low-precision activations: single-co-pass stats with f32
        # accumulation (no materialized f32 copy of the tensor), then the
        # affine transform folded into ONE activation-width elementwise
        # pass: out = x * (inv*scale) + (bias - mean*inv*scale).
        xg = x.reshape(batch_shape + (-1, g, c // g))
        mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)    # [B, G]
        sq = jnp.mean(
            jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)                    # [B, G]
        inv_c = jnp.repeat(inv, c // g, axis=-1)               # [B, C]
        mean_c = jnp.repeat(mean, c // g, axis=-1)
        if self.use_affine:
            sc = inv_c * scale[None]
            sh = bias[None] - mean_c * sc
        else:
            sc = inv_c
            sh = -mean_c * sc
        bcast = (slice(None),) + (None,) * len(spatial) + (slice(None),)
        return (
            x * sc[bcast].astype(orig_dtype) + sh[bcast].astype(orig_dtype)
        )


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dim (eps=1e-5 default)."""

    dim: int
    eps: float = 1e-5
    use_affine: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) / jnp.sqrt(var + self.eps)
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
            out = out * scale + bias
        return out.astype(orig_dtype)


def instance_norm_2d(x, eps: float = 1e-5):
    """torch.nn.InstanceNorm2d defaults (no affine, no running stats) on
    NHWC inputs: normalize each (sample, channel) over H, W.

    Statistics accumulate in float32 (matching torch for f32 inputs); the
    input tensor itself is never materialized in f32 — on bf16 activations
    the normalize pass stays bf16-width in HBM, which matters because this
    runs on the 512-channel factorized-attention tensors.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean), axis=(1, 2), keepdims=True
    )
    inv = jax.lax.rsqrt(var + eps)
    return ((x.astype(jnp.float32) - mean) * inv).astype(x.dtype)
