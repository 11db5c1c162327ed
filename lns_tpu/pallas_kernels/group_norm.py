"""Fused GroupNorm(+affine)(+swish) Pallas kernel.

The resblock prologue GN -> swish -> conv appears ~20x per decode pass;
unfused it costs multiple HBM round-trips over half-GB activation tensors.
This kernel computes group statistics and writes the normalized (optionally
swish-activated) output in a single HBM read + write per sample slab.

Mosaic notes: channels-per-group is 2-4 here, so the natural
[S, G, C/G]-reshape is a lane-split Mosaic rejects; instead the kernel
reduces per-CHANNEL moments over the spatial (sublane) axis and mixes them
into group moments with a tiny 0/1 matmul (C x G), all reshape-free.
Statistics accumulate in f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, scale_ref, bias_ref, mix_ref, o_ref, *, eps: float,
               apply_swish: bool, spatial: int, cg: int):
    x = x_ref[0]  # [S, C]
    xf = x.astype(jnp.float32)
    # per-channel moments over spatial (sublane) axis -> [1, C]
    s1 = jnp.sum(xf, axis=0, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    mix = mix_ref[...].astype(jnp.float32)  # [C, G] 0/1 group membership
    denom = spatial * cg
    hi = jax.lax.Precision.HIGHEST  # group mixing must not drop to bf16 passes
    g1 = jnp.dot(s1, mix, preferred_element_type=jnp.float32, precision=hi) / denom
    g2 = jnp.dot(s2, mix, preferred_element_type=jnp.float32, precision=hi) / denom
    var = g2 - g1 * g1
    inv = jax.lax.rsqrt(var + eps)
    # broadcast group moments back to channels: [1, G] @ [G, C]
    mean_c = jnp.dot(g1, mix.T, preferred_element_type=jnp.float32, precision=hi)
    inv_c = jnp.dot(inv, mix.T, preferred_element_type=jnp.float32, precision=hi)
    out = (xf - mean_c) * inv_c
    out = out * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if apply_swish:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_group_norm_swish(x, scale, bias, num_groups: int, eps: float = 1e-6,
                           apply_swish: bool = True, interpret: bool = False):
    """GroupNorm (+swish) on [B, *spatial, C] in one HBM pass per sample."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    x2 = x.reshape(b, s, c)
    cg = c // num_groups
    mix = np.zeros((c, num_groups), np.float32)
    for ch in range(c):
        mix[ch, ch // cg] = 1.0
    mix = jnp.asarray(mix)

    kernel = functools.partial(
        _gn_kernel, eps=eps, apply_swish=apply_swish, spatial=s, cg=cg
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias, mix)
    return out.reshape(orig_shape)
