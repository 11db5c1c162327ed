"""Self / linear / cross attention blocks (reference: modules/basics.py:331-528).

Operates on channels-last inputs: either token sequences [b, n, c] or
spatial fields [b, *spatial, c] (auto-flattened row-major, matching the
reference's `x.view(b, c, -1).transpose(1, 2)` token ordering).

Attention runs on <= a few hundred tokens in this framework (the latent
grids), so a plain batched QK^T einsum is already MXU-optimal — no
flash-attention tiling needed at these sizes.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lns_tpu.ops.conv import Dense
from lns_tpu.ops.initializers import normal_init


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
from lns_tpu.ops.norms import LayerNorm


def _flatten_tokens(x):
    """[b, *spatial, c] -> ([b, n, c], spatial) ; [b, n, c] passes through."""
    if x.ndim == 3:
        return x, None
    spatial = x.shape[1:-1]
    return x.reshape(x.shape[0], -1, x.shape[-1]), spatial


def _unflatten_tokens(x, spatial):
    if spatial is None:
        return x
    return x.reshape((x.shape[0],) + spatial + (x.shape[-1],))


def _heads_split(t, heads):
    b, n, hd = t.shape
    return t.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)  # [b, h, n, d]


def _heads_merge(t):
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class SABlock(nn.Module):
    """Pre-LN multi-head self-attention with optional learnable positional
    embedding of length `block_size` (reference: modules/basics.py:331-404).
    All projections init N(0, 0.02), biases zero."""

    dim: int
    heads: int
    dim_head: int
    use_pe: bool = False
    block_size: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x, spatial = _flatten_tokens(x)
        n = x.shape[1]
        x_in = x
        h = LayerNorm(self.dim, name="ln")(x)
        if self.use_pe:
            pe = self.param("pe", normal_init(0.02), (1, self.block_size, self.dim))
            h = h + pe[:, :n].astype(h.dtype)
        hd = self.heads * self.dim_head
        gpt_init = dict(kernel_init=normal_init(0.02), bias_init=zeros_init)
        q = Dense(hd, use_bias=False, kernel_init=normal_init(0.02), name="to_q")(h)
        k = Dense(hd, use_bias=False, kernel_init=normal_init(0.02), name="to_k")(h)
        v = Dense(hd, **gpt_init, name="to_v")(h)
        q, k, v = (_heads_split(t, self.heads) for t in (q, k, v))
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = Dense(self.dim, **gpt_init, name="proj_out")(_heads_merge(out))
        out = x_in + out
        return _unflatten_tokens(out, spatial)


class LABlock(nn.Module):
    """SABlock without softmax — linear (unnormalized) attention kernel
    (reference: modules/basics.py:407-478). Dead in shipped configs; provided
    as a library option."""

    dim: int
    heads: int
    dim_head: int
    use_pe: bool = False
    block_size: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x, spatial = _flatten_tokens(x)
        n = x.shape[1]
        h = LayerNorm(self.dim, name="ln")(x)
        if self.use_pe:
            pe = self.param("pe", normal_init(0.02), (1, self.block_size, self.dim))
            h = h + pe[:, :n].astype(h.dtype)
        hd = self.heads * self.dim_head
        gpt_init = dict(kernel_init=normal_init(0.02), bias_init=zeros_init)
        q = Dense(hd, use_bias=False, kernel_init=normal_init(0.02), name="to_q")(h)
        k = Dense(hd, use_bias=False, kernel_init=normal_init(0.02), name="to_k")(h)
        v = Dense(hd, **gpt_init, name="to_v")(h)
        q, k, v = (_heads_split(t, self.heads) for t in (q, k, v))
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = Dense(self.dim, **gpt_init, name="proj_out")(_heads_merge(out))
        out = out + x
        return _unflatten_tokens(out, spatial)


class CABlock(nn.Module):
    """Cross-attention: query = spatial field x, key/value = context tokens y
    (reference: modules/basics.py:481-528; the reference's inverted
    un-reshape condition at basics.py:526 is fixed here — output is always
    restored to the input's spatial layout)."""

    dim: int
    context_dim: int
    heads: int
    dim_head: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y):
        x, spatial = _flatten_tokens(x)
        xq = LayerNorm(self.dim, name="ln_x")(x)
        yk = LayerNorm(self.context_dim, name="ln_y")(y)
        hd = self.heads * self.dim_head
        q = Dense(hd, use_bias=False, name="to_q")(xq)
        k = Dense(hd, use_bias=False, name="to_k")(yk)
        v = Dense(hd, name="to_v")(yk)
        q, k, v = (_heads_split(t, self.heads) for t in (q, k, v))
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = Dense(self.dim, name="proj_out")(_heads_merge(out))
        # NOTE: reference applies the residual to the *normalized* query
        # (basics.py:508 rebinds x = ln_x(x) before `out = x + out`); matched.
        out = xq + out
        return _unflatten_tokens(out, spatial)
