"""Positional / parameter embeddings (reference: modules/embedding.py and
modules/cond_utils.py:19-38).

Includes rotary embeddings over continuous coordinates (used by the live
factorized-attention path), sinusoidal fourier embeddings of scalar
conditioning parameters (live in the conditional propagator), and the SIREN
stack + EmbeddingWrapper (library options; dead in the reference's shipped
configs, SURVEY.md section 2.3).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lns_tpu.ops.conv import Dense
from lns_tpu.ops.initializers import normal_init, siren_init


# ---------------------------------------------------------------------------
# Rotary embeddings (reference: modules/embedding.py:163-208)
# ---------------------------------------------------------------------------

def rotary_freqs(coordinates, dim: int, min_freq: float = 1.0 / 64, scale: float = 1.0):
    """RotaryEmbedding.forward: coordinates [b, n] -> freqs [b, n, dim]."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = coordinates.astype(jnp.float32) * (scale / min_freq)
    freqs = jnp.einsum("...i,j->...ij", t, inv_freq)  # [b, n, dim/2]
    return jnp.concatenate((freqs, freqs), axis=-1)  # [b, n, dim]


class RotaryEmbedding:
    """Callable wrapper mirroring the reference module API (stateless)."""

    def __init__(self, dim: int, min_freq: float = 1.0 / 64, scale: float = 1.0):
        self.dim = dim
        self.min_freq = min_freq
        self.scale = scale

    def __call__(self, coordinates):
        return rotary_freqs(coordinates, self.dim, self.min_freq, self.scale)


def rotate_half(x):
    """Split the last dim in two halves (j=2 chunks) and rotate:
    (x1, x2) -> (-x2, x1) (reference: modules/embedding.py:179-182)."""
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return jnp.concatenate((-x2, x1), axis=-1)


def apply_rotary_pos_emb(t, freqs):
    return (t * jnp.cos(freqs)) + (rotate_half(t) * jnp.sin(freqs))


def apply_2d_rotary_pos_emb(t, freqs_x, freqs_y):
    d = t.shape[-1]
    t_x, t_y = t[..., : d // 2], t[..., d // 2 :]
    return jnp.concatenate(
        (apply_rotary_pos_emb(t_x, freqs_x), apply_rotary_pos_emb(t_y, freqs_y)), axis=-1
    )


def apply_3d_rotary_pos_emb(t, freqs_x, freqs_y, freqs_z):
    d = t.shape[-1]
    t_x = t[..., : d // 3]
    t_y = t[..., d // 3 : 2 * d // 3]
    t_z = t[..., 2 * d // 3 :]
    return jnp.concatenate(
        (
            apply_rotary_pos_emb(t_x, freqs_x),
            apply_rotary_pos_emb(t_y, freqs_y),
            apply_rotary_pos_emb(t_z, freqs_z),
        ),
        axis=-1,
    )


def get_emb(sin_inp):
    """Interleaved sin/cos base embedding (reference: embedding.py:212-217)."""
    emb = jnp.stack((jnp.sin(sin_inp), jnp.cos(sin_inp)), axis=-1)
    return emb.reshape(emb.shape[:-2] + (-1,))


# ---------------------------------------------------------------------------
# Sinusoidal scalar-parameter embedding (reference: cond_utils.py:19-38)
# ---------------------------------------------------------------------------

def fourier_embedding(timesteps, dim: int, max_period: int = 10000):
    """[N] scalars -> [N, dim] sinusoidal embedding (cos | sin halves)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


# ---------------------------------------------------------------------------
# SIREN (reference: embedding.py:17-123) — library option
# ---------------------------------------------------------------------------

def Sine(w0: float = 1.0):
    return lambda x: jnp.sin(w0 * x)


class Siren(nn.Module):
    dim_in: int
    dim_out: int
    w0: float = 1.0
    c: float = 6.0
    is_first: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        init = siren_init(self.dim_in, self.w0, self.c, self.is_first)
        kernel = self.param("kernel", init, (self.dim_in, self.dim_out))
        out = x @ kernel
        if self.use_bias:
            bias = self.param("bias", init, (self.dim_out,))
            out = out + bias
        return jnp.sin(self.w0 * out)


class SirenNet(nn.Module):
    """SIREN MLP with min-max input normalization and a N(0,0.02)-init final
    linear layer (reference: embedding.py:64-123)."""

    dim_in: int
    dim_hidden: int
    dim_out: int
    num_layers: int
    w0: float = 1.0
    w0_initial: float = 30.0
    use_bias: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x, mods=None):
        if self.normalize_input:
            mn = jnp.min(x, axis=1, keepdims=True)
            mx = jnp.max(x, axis=1, keepdims=True)
            x = (2 * x - mn - mx) / (mx - mn)
        for ind in range(self.num_layers):
            x = Siren(
                dim_in=self.dim_in if ind == 0 else self.dim_hidden,
                dim_out=self.dim_hidden,
                w0=self.w0_initial if ind == 0 else self.w0,
                use_bias=self.use_bias,
                is_first=ind == 0,
                name=f"siren_{ind}",
            )(x)
        if mods is not None:
            x = x * mods
        x = Dense(
            self.dim_out,
            kernel_init=normal_init(0.02),
            bias_init=lambda k, s, d=jnp.float32: jnp.zeros(s, d),
            name="last_layer",
        )(x)
        return x


class EmbeddingWrapper(nn.Module):
    """Config-driven context embedder: one sub-embedder per context key
    ('siren' | 'embedding' | 'linear'), stacked to [b, n_context, emb_dim]
    (reference: embedding.py:126-159)."""

    keys: Sequence[str]
    settings: Sequence[dict]

    @nn.compact
    def __call__(self, context: dict):
        outs = []
        for k, v in zip(self.keys, self.settings):
            assert k.endswith("emb"), "context embedding key must end with emb"
            param_name = k[:-4]
            assert param_name in context, f"missing context value {param_name}"
            val = context[param_name]
            enc = v["encoder"]
            if enc == "siren":
                out = SirenNet(
                    dim_in=v["in_channels"],
                    dim_hidden=v["hidden_channels"],
                    dim_out=v["out_channels"],
                    num_layers=v["num_layers"],
                    normalize_input=False,
                    name=k,
                )(val)
            elif enc == "embedding":
                assert v["in_channels"] == 1
                table = self.param(
                    k, nn.initializers.normal(1.0), (v["num_embeddings"], v["out_channels"])
                )
                out = table[val.astype(jnp.int32).reshape(-1)]
            elif enc == "linear":
                out = Dense(v["out_channels"], name=k)(val)
            else:
                raise ValueError(f"unknown encoder {enc}")
            if out.ndim == 3:
                out = out[:, 0]
            outs.append(out)
        if len(outs) == 1:
            return outs[0][:, None]
        return jnp.stack(outs, axis=1)
