"""Conditional spectral convolution (reference: modules/fourier_cond.py,
from pdearena, MIT).

FreqLinear maps a conditioning vector to complex per-mode scalings; the
conditional SpectralConv2d multiplies retained Fourier modes by those
embeddings before the weight einsum; CondFourierBasicBlock adds a 1x1 conv
bypass and an additive conditioning bias. Dead in the reference's shipped
configs but part of its specified capability surface (SURVEY.md section 2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lns_tpu.ops.activations import gelu
from lns_tpu.ops.conv import Conv1x1, Dense
from lns_tpu.ops.initializers import uniform_scale_init
from lns_tpu.ops.spectral import _as_complex, batchmul2d


def _cond_batchmul2d(x_ft, w, emb):
    """(input * emb) @ w over channels, channels-last.

    x_ft: [b, m1, m2, i]; w: [i, o, m1, m2] complex; emb: [b, m1, m2] complex.
    (reference: fourier_cond.py:10-13 — emb broadcast over channels.)
    """
    temp = x_ft * emb[..., None]
    return jnp.einsum("bxyi,ioxy->bxyo", temp, w)


class FreqLinear(nn.Module):
    """cond vector [b, c] -> complex per-mode scalings [b, m1, m2, 2(banks)]
    (reference: fourier_cond.py:16-29)."""

    in_channel: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x):
        scale = 1.0 / (self.in_channel + 4 * self.modes1 * self.modes2)

        def winit(key, shape, dtype=jnp.float32):
            return scale * jax.random.normal(key, shape, dtype)

        weights = self.param("weights", winit, (self.in_channel, 4 * self.modes1 * self.modes2))
        bias = self.param(
            "bias", lambda k, s, d=jnp.float32: jnp.zeros(s, d), (1, 4 * self.modes1 * self.modes2)
        )
        h = jnp.einsum("tc,cm->tm", x, weights) + bias
        h = h.reshape(x.shape[0], self.modes1, self.modes2, 2, 2)
        return jax.lax.complex(h[..., 0], h[..., 1])  # [b, m1, m2, 2banks]


class CondSpectralConv2d(nn.Module):
    """SpectralConv2d with per-mode conditional scalings
    (reference: fourier_cond.py:32-81). NHWC input [b, h, w, c]."""

    in_channels: int
    out_channels: int
    cond_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x, emb):
        h, w = x.shape[1], x.shape[2]
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes1, self.modes2, 2)
        w1 = self.param("weights1", uniform_scale_init(scale), shape)
        w2 = self.param("weights2", uniform_scale_init(scale), shape)
        emb12 = FreqLinear(self.cond_channels, self.modes1, self.modes2, name="cond_emb")(emb)
        emb1, emb2 = emb12[..., 0], emb12[..., 1]

        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        out_ft = jnp.zeros((x.shape[0], h, w // 2 + 1, self.out_channels), dtype=x_ft.dtype)
        top = _cond_batchmul2d(x_ft[:, : self.modes1, : self.modes2, :], _as_complex(w1), emb1)
        bot = _cond_batchmul2d(x_ft[:, -self.modes1 :, : self.modes2, :], _as_complex(w2), emb2)
        out_ft = out_ft.at[:, : self.modes1, : self.modes2, :].set(top)
        out_ft = out_ft.at[:, -self.modes1 :, : self.modes2, :].set(bot)
        y = jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2))
        return y.astype(x.dtype)


class CondFourierBasicBlock(nn.Module):
    """Conditional FNO block: conditional spectral conv + 1x1 conv bypass +
    additive conditioning bias, GELU, optional residual
    (reference: fourier_cond.py:84-118). 2D only."""

    in_planes: int
    planes: int
    modes: Sequence[int]
    residual: bool = True

    @nn.compact
    def __call__(self, x, cond_emb):
        assert len(self.modes) == 2
        x1 = CondSpectralConv2d(
            self.in_planes, self.planes, self.in_planes, self.modes[0], self.modes[1],
            name="fourier",
        )(x, cond_emb)
        x2 = Conv1x1(self.planes, name="conv")(x)
        emb_out = Dense(self.planes, name="cond_emb")(cond_emb)
        while emb_out.ndim < x2.ndim:
            emb_out = emb_out[:, None]
        out = gelu(x1 + x2 + emb_out)
        if self.residual:
            out = x + out
        return out
