"""Latent-space propagators.

`SimpleCNN` (+ `DilatedResidualBlock`) is the propagator the reference
actually trains — it is copy-pasted into each stage-2 trainer with
per-workload padding (circular for NS2d, half-periodic-x for SW, zeros for
two-phase; train_stage2_ns2d.py:25-87 etc.); here it is one parameterized
module. The conditional variant adds FiLM-style conditioning from a scalar
parameter (train_stage2_twophase_conditional.py:25-121).

`SimpleResNet` / `SimpleMLP` / `ConditionalResNet` mirror the library
propagators in modules/propagator.py (dead in the reference; the reference's
SimpleResNet is additionally broken — missing `num_dimensions` args,
propagator.py:22-24 — fixed here by construction).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from lns_tpu.ops.activations import gelu, swish
from lns_tpu.ops.attention import CABlock, SABlock
from lns_tpu.ops.conditioning import zeros_init_module
from lns_tpu.ops.conv import Conv1x1, ConvND, Dense, HalfPeriodicConv2d
from lns_tpu.ops.embedding import fourier_embedding
from lns_tpu.ops.norms import GroupNorm
from lns_tpu.ops.resblocks import ResidualBlock


def _conv3(features, padding, dilation, padding_mode, dtype, name):
    if padding_mode in ("half_periodic_x", "half_periodic_y"):
        return HalfPeriodicConv2d(
            features, 3, padding=padding, dilation=dilation,
            periodic_direction=padding_mode[-1], dtype=dtype, name=name,
        )
    return ConvND(
        features, 3, padding=padding, dilation=dilation,
        padding_mode=padding_mode, dtype=dtype, name=name,
    )


class DilatedResidualBlock(nn.Module):
    """GN(1) -> conv3 -> GELU -> dilated conv3 -> GELU -> conv3, residual;
    then a 1x1 FFN residual (reference: train_stage2_ns2d.py:25-53)."""

    dim: int
    dilation: int = 1
    padding_mode: str = "circular"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(1, self.dim, eps=1e-5, name="conv_gn")(x)
        h = _conv3(self.dim, 1, 1, self.padding_mode, self.dtype, "conv1")(h)
        h = gelu(h)
        h = _conv3(self.dim, self.dilation, self.dilation, self.padding_mode, self.dtype, "conv2")(h)
        h = gelu(h)
        h = _conv3(self.dim, 1, 1, self.padding_mode, self.dtype, "conv3")(h)
        x = x + h
        f = GroupNorm(1, self.dim, eps=1e-5, name="ffn_gn")(x)
        f = Conv1x1(self.dim, use_bias=False, dtype=self.dtype, name="ffn_fc1")(f)
        f = gelu(f)
        f = Conv1x1(self.dim, use_bias=False, dtype=self.dtype, name="ffn_fc2")(f)
        return x + f


class SimpleCNN(nn.Module):
    """1x1 in_proj -> N DilatedResidualBlocks -> GN + 1x1 out_proj; predicts
    the next latent state directly (reference: train_stage2_ns2d.py:56-87)."""

    latent_dim: int
    prop_n_block: int
    prop_n_embd: int
    dilation: int = 2
    padding_mode: str = "circular"
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        h = Conv1x1(self.prop_n_embd, dtype=self.dtype, name="in_proj")(z)
        for i in range(self.prop_n_block):
            h = DilatedResidualBlock(
                self.prop_n_embd, dilation=self.dilation,
                padding_mode=self.padding_mode, dtype=self.dtype, name=f"net{i}",
            )(h)
        h = GroupNorm(32, self.prop_n_embd, eps=1e-6, name="out_gn")(h)
        h = Conv1x1(self.latent_dim, dtype=self.dtype, name="out_proj")(h)
        return h


class CondDilatedResidualBlock(nn.Module):
    """Conditional dilated block: additive embedding after the dilated conv,
    zero-init gated conv, and FiLM scaling of the FFN input
    (reference: train_stage2_twophase_conditional.py:25-77)."""

    dim: int
    cond_emb_dim: int
    dilation: int = 1
    padding_mode: str = "zeros"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond_emb):
        emb_out = Dense(self.dim, name="cond_emb")(cond_emb)
        emb_out = emb_out[:, None, None, :]  # broadcast over H, W

        x_skip = x
        h = GroupNorm(1, self.dim, eps=1e-5, name="conv1_gn")(x)
        h = _conv3(self.dim, 1, 1, self.padding_mode, self.dtype, "conv1_a")(h)
        h = gelu(h)
        h = _conv3(self.dim, self.dilation, self.dilation, self.padding_mode, self.dtype, "conv1_b")(h)
        h = h + emb_out

        g = GroupNorm(1, self.dim, eps=1e-5, name="cond_conv1_gn")(h)
        g = gelu(g)
        g = ConvND(
            self.dim, 3, padding=1, padding_mode=self.padding_mode,
            kernel_init=zeros_init_module, bias_init=zeros_init_module,
            dtype=self.dtype, name="cond_conv1",
        )(g)
        x = x_skip + g

        # FiLM gate on the FFN input: x * (1 + cond_conv2(emb))
        c = GroupNorm(1, self.dim, eps=1e-5, name="cond_conv2_gn")(emb_out)
        c = Conv1x1(self.dim, name="cond_conv2_fc1")(c)
        c = gelu(c)
        c = Conv1x1(
            self.dim, kernel_init=zeros_init_module, bias_init=zeros_init_module,
            name="cond_conv2_fc2",
        )(c)

        f = x * (1.0 + c)
        f = GroupNorm(1, self.dim, eps=1e-5, name="ffn_gn")(f)
        f = Conv1x1(self.dim, use_bias=False, dtype=self.dtype, name="ffn_fc1")(f)
        f = gelu(f)
        f = Conv1x1(self.dim, use_bias=False, dtype=self.dtype, name="ffn_fc2")(f)
        return x + f


class CondSimpleCNN(nn.Module):
    """Conditional propagator: scalar param -> fourier embedding -> MLP ->
    per-block conditioning (reference:
    train_stage2_twophase_conditional.py:80-121)."""

    latent_dim: int
    cond_emb_dim: int
    prop_n_block: int
    prop_n_embd: int
    dilation: int = 2
    padding_mode: str = "zeros"
    dtype: Any = None

    @nn.compact
    def __call__(self, z, param):
        emb = fourier_embedding(param, self.cond_emb_dim)
        emb = Dense(self.cond_emb_dim, name="cond_proj_fc1")(emb)
        emb = gelu(emb)
        emb = Dense(self.cond_emb_dim, name="cond_proj_fc2")(emb)

        h = Conv1x1(self.prop_n_embd, dtype=self.dtype, name="in_proj")(z)
        for i in range(self.prop_n_block):
            h = CondDilatedResidualBlock(
                self.prop_n_embd, self.cond_emb_dim, dilation=self.dilation,
                padding_mode=self.padding_mode, dtype=self.dtype, name=f"net{i}",
            )(h, emb)
        h = GroupNorm(32, self.prop_n_embd, eps=1e-6, name="out_gn")(h)
        h = Conv1x1(self.latent_dim, dtype=self.dtype, name="out_proj")(h)
        return h


# ---------------------------------------------------------------------------
# Library propagators (reference: modules/propagator.py — dead code there,
# functional options here)
# ---------------------------------------------------------------------------


class SimpleResNet(nn.Module):
    """Plain latent conv ResNet (reference: propagator.py:9-31; the
    reference version is unconstructible — ResidualBlock calls were missing
    `num_dimensions` — fixed here)."""

    latent_dim: int
    propagator_dim: int
    is_periodic: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        pm = "circular" if self.is_periodic else "zeros"
        h = Conv1x1(self.propagator_dim, dtype=self.dtype, name="in_proj")(z)
        h = swish(h)
        h = ConvND(self.propagator_dim, 3, padding=1, padding_mode=pm, dtype=self.dtype, name="stem")(h)
        h = GroupNorm(32, self.propagator_dim, eps=1e-6, name="gn_in")(h)
        for i in range(3):
            h = ResidualBlock(self.propagator_dim, self.propagator_dim, 2,
                              padding_mode=pm, dtype=self.dtype, name=f"res{i}")(h)
        h = GroupNorm(32, self.propagator_dim, eps=1e-6, name="gn_out")(h)
        h = swish(h)
        return Conv1x1(self.latent_dim, dtype=self.dtype, name="out_proj")(h)


class SimpleMLP(nn.Module):
    """Flatten-latent MLP with residual delta update
    (reference: propagator.py:34-51)."""

    latent_dim: int
    latent_resolution: int
    propagator_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        b, h, w, c = z.shape
        flat = z.reshape(b, 1, h * w * c)
        d = Dense(self.propagator_dim, name="fc1")(flat)
        d = swish(d)
        d = Dense(self.propagator_dim, name="fc2")(d)
        d = swish(d)
        d = Dense(h * w * c, name="fc3")(d)
        return (flat + d).reshape(b, h, w, c)


class ConditionalResNet(nn.Module):
    """Per-block [self-attention] + cross-attention on a context embedding +
    resblock (reference: propagator.py:53-112)."""

    latent_dim: int
    propagator_dim: int
    context_dim: int
    n_blocks: int = 3
    heads: int = 8
    dim_head: int = 64
    use_self_attn: bool = True
    is_periodic: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, z, context):
        pm = "circular" if self.is_periodic else "zeros"
        h = Conv1x1(self.propagator_dim, dtype=self.dtype, name="in_proj")(z)
        for i in range(self.n_blocks):
            if self.use_self_attn:
                h = SABlock(self.propagator_dim, self.heads, self.dim_head, name=f"sa{i}")(h)
            h = CABlock(self.propagator_dim, self.context_dim, self.heads, self.dim_head,
                        name=f"ca{i}")(h, context)
            h = ResidualBlock(self.propagator_dim, self.propagator_dim, 2,
                              padding_mode=pm, dtype=self.dtype, name=f"res{i}")(h)
        h = GroupNorm(32, self.propagator_dim, eps=1e-6, name="gn_out")(h)
        h = swish(h)
        return Conv1x1(self.latent_dim, dtype=self.dtype, name="out_proj")(h)


def build_propagator(cfg, dtype=None):
    """Select the stage-2 propagator for a reference config."""
    pm = {"ns2d": "circular", "sw": "half_periodic_x"}.get(cfg.workload, "zeros")
    if cfg.is_conditional:
        return CondSimpleCNN(
            latent_dim=cfg.latent_dim,
            cond_emb_dim=cfg.latent_dim,
            prop_n_block=cfg.prop_n_block,
            prop_n_embd=cfg.prop_n_embd,
            dilation=cfg.dilation,
            padding_mode="zeros",
            dtype=dtype,
        )
    return SimpleCNN(
        latent_dim=cfg.latent_dim,
        prop_n_block=cfg.prop_n_block,
        prop_n_embd=cfg.prop_n_embd,
        dilation=cfg.dilation,
        padding_mode=pm,
        dtype=dtype,
    )
