"""Stage-1 autoencoders (all three boundary-topology variants + conditional).

A `SimpleAutoencoder` maps full-order NHWC grid fields to a mesh-reduced
latent grid and back: encode = quant_conv(encoder(x)),
decode = decoder(post_quant_conv(z)) — mirroring the reference's module
skeleton (modules/autoencoder2d.py:160-186) including the VQGAN-lineage
`quant_conv` naming that is part of the checkpoint compat surface.

The encoder/decoder stacks are instantiated from the layer-spec IR in
`lns_tpu.models.specs`, shared with the torch checkpoint converter.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lns_tpu.models.specs import (
    LayerSpec,
    STATELESS_KINDS,
    decoder_spec,
    encoder_spec,
)
from lns_tpu.ops.activations import swish
from lns_tpu.ops.attention import SABlock
from lns_tpu.ops.conditioning import CondResidualBlock
from lns_tpu.ops.conv import Conv1x1, ConvND, Dense, HalfPeriodicConv2d
from lns_tpu.ops.embedding import fourier_embedding
from lns_tpu.ops.factorized_attention import FABlock2D
from lns_tpu.ops.fno import FourierBasicBlock
from lns_tpu.ops.norms import GroupNorm
from lns_tpu.ops.resblocks import (
    DownSampleBlock,
    DownSampleBlock2dHalfPeriodic,
    HalfPeriodicResBlock2d,
    ResidualBlock,
    UpSampleBlock,
    UpSampleBlock2dHalfPeriodic,
)
from lns_tpu.ops.sampling import resize_nearest_torch


def build_layer(spec: LayerSpec, dtype=None):
    """Instantiate the flax module for a (stateful) layer spec."""
    kw = spec.kw
    kind = spec.kind
    name = spec.name
    if kind == "conv":
        if kw.get("kernel_size", 1) == 1 and kw.get("stride", 1) == 1:
            return Conv1x1(kw["features"], dtype=dtype, name=name)
        return ConvND(
            kw["features"],
            kw["kernel_size"],
            num_dimensions=2,
            stride=kw.get("stride", 1),
            padding=kw.get("padding", 0),
            padding_mode=kw.get("padding_mode", "zeros"),
            upsample_2x=kw.get("upsample_2x", False),
            dtype=dtype,
            name=name,
        )
    if kind == "hp_conv":
        return HalfPeriodicConv2d(
            kw["features"],
            kw.get("kernel_size", 3),
            stride=kw.get("stride", 1),
            padding=kw.get("padding", 0),
            periodic_direction=kw.get("periodic_direction", "x"),
            upsample_2x=kw.get("upsample_2x", False),
            dtype=dtype,
            name=name,
        )
    if kind == "gn":
        return GroupNorm(kw["groups"], kw["channels"], eps=kw["eps"], name=name)
    if kind == "resblock":
        return ResidualBlock(
            kw["in_channels"], kw["out_channels"], 2,
            padding_mode=kw.get("padding_mode", "zeros"), dtype=dtype, name=name,
        )
    if kind == "hp_resblock":
        return HalfPeriodicResBlock2d(
            kw["in_channels"], kw["out_channels"],
            periodic_direction=kw.get("periodic_direction", "x"), dtype=dtype, name=name,
        )
    if kind == "down":
        return DownSampleBlock(kw["channels"], 2, padding_mode=kw.get("padding_mode", "zeros"),
                               dtype=dtype, name=name)
    if kind == "up":
        return UpSampleBlock(kw["channels"], 2, padding_mode=kw.get("padding_mode", "zeros"),
                             dtype=dtype, name=name)
    if kind == "hp_down":
        return DownSampleBlock2dHalfPeriodic(
            kw["channels"], periodic_direction=kw.get("periodic_direction", "x"),
            dtype=dtype, name=name)
    if kind == "hp_up":
        return UpSampleBlock2dHalfPeriodic(
            kw["channels"], periodic_direction=kw.get("periodic_direction", "x"),
            dtype=dtype, name=name)
    if kind == "sablock":
        return SABlock(kw["dim"], kw["heads"], kw["dim_head"], use_pe=kw["use_pe"],
                       block_size=kw["block_size"], dtype=dtype, name=name)
    if kind == "fablock":
        return FABlock2D(kw["dim"], kw["dim_head"], kw["latent_dim"], kw["heads"],
                         kw["dim_out"], dtype=dtype, name=name)
    if kind == "fourier":
        return FourierBasicBlock(kw["in_planes"], kw["planes"], tuple(kw["modes"]),
                                 dtype=dtype, name=name)
    raise ValueError(f"unknown layer kind {kind}")


class SpecSequential(nn.Module):
    """Sequential stack instantiated from a layer-spec tuple."""

    specs: Tuple[LayerSpec, ...]
    dtype: Any = None

    def setup(self):
        layers = {}
        for spec in self.specs:
            if spec.kind in STATELESS_KINDS:
                continue
            layers[spec.name] = build_layer(spec, self.dtype)
        self._layers = layers

    def __call__(self, x):
        for spec in self.specs:
            if spec.kind == "swish":
                x = swish(x)
            elif spec.kind == "resize":
                kw = spec.kw
                if kw.get("fused"):
                    # exact-2x resize folded into the following conv's
                    # lhs-dilated lowering (specs.py marks both sides)
                    pass
                else:
                    x = resize_nearest_torch(x, kw["out_h"], kw["out_w"])
            else:
                x = self._layers[spec.name](x)
        return x


class SimpleAutoencoder(nn.Module):
    """Deterministic conv autoencoder (reference SimpleAutoencoder; one class
    covers all three boundary variants via the spec builders)."""

    cfg: Any
    dtype: Any = None

    def setup(self):
        self.encoder = SpecSequential(tuple(encoder_spec(self.cfg)), dtype=self.dtype, name="encoder")
        self.decoder = SpecSequential(tuple(decoder_spec(self.cfg)), dtype=self.dtype, name="decoder")
        self.quant_conv = Conv1x1(self.cfg.latent_dim, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv1x1(self.cfg.latent_dim, dtype=self.dtype, name="post_quant_conv")

    def __call__(self, x):
        return self.decode(self.encode(x))

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


class CondEncoder(nn.Module):
    """Scalar-parameter-conditioned encoder: fourier embedding -> MLP ->
    CondResidualBlocks at every level (reference:
    modules/autoencoder2d_nonsquared.py:71-145)."""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, param):
        cfg = self.cfg
        channels = list(cfg.encoder_channels)
        num_res_blocks = cfg.encoder_res_blocks
        pm = "circular" if cfg.is_periodic else "zeros"
        cond_ch = cfg.cond_emb_channels

        emb = fourier_embedding(param, cond_ch)
        emb = Dense(channels[0], name="embed_fc1")(emb)
        emb = swish(emb)
        emb = Dense(cond_ch, name="embed_fc2")(emb)

        h = Conv1x1(channels[0], dtype=self.dtype, name="to_in_conv1")(x)
        h = swish(h)
        h = ConvND(channels[0], 3, padding=1, padding_mode=pm, dtype=self.dtype,
                   name="to_in_conv2")(h)

        n_levels = len(channels) - 1
        for i in range(n_levels):
            in_ch = channels[i]
            out_ch = channels[i + 1]
            for j in range(num_res_blocks):
                h = CondResidualBlock(
                    in_ch, out_ch, cond_channels=cond_ch, norm=True,
                    padding_mode=pm, dtype=self.dtype, name=f"level{i}_res{j}",
                )(h, emb)
                in_ch = out_ch
            if i != n_levels - 1:
                h = DownSampleBlock(channels[i + 1], 2, padding_mode=pm, dtype=self.dtype,
                                    name=f"level{i}_down")(h)
        h = CondResidualBlock(
            channels[-1], channels[-1], cond_channels=cond_ch, norm=True,
            padding_mode=pm, dtype=self.dtype, name="to_out_conv",
        )(h, emb)
        h = GroupNorm(32, channels[-1], eps=1e-6, name="to_out_gn")(h)
        h = swish(h)
        h = Conv1x1(cfg.latent_dim, dtype=self.dtype, name="to_out_proj")(h)
        return h


class ConditionalSimpleAutoencoder(nn.Module):
    """Conditional-encoder AE (reference:
    modules/autoencoder2d_nonsquared.py:279-305)."""

    cfg: Any
    dtype: Any = None

    def setup(self):
        self.encoder = CondEncoder(self.cfg, dtype=self.dtype, name="encoder")
        self.decoder = SpecSequential(tuple(decoder_spec(self.cfg)), dtype=self.dtype, name="decoder")
        self.quant_conv = Conv1x1(self.cfg.latent_dim, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv1x1(self.cfg.latent_dim, dtype=self.dtype, name="post_quant_conv")

    def __call__(self, x, param):
        return self.decode(self.encode(x, param))

    def encode(self, x, param):
        return self.quant_conv(self.encoder(x, param))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def build_autoencoder(cfg, dtype=None) -> SimpleAutoencoder:
    return SimpleAutoencoder(cfg, dtype=dtype)
