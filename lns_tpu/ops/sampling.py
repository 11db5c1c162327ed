"""Resampling ops matching torch's nearest-neighbor semantics.

torch `F.interpolate(mode='nearest')` maps output index i to source index
floor(i * in/out) — *not* the half-pixel-centered rule jax.image.resize
uses — so both the scale-2 upsample (modules/basics.py:296) and the decoder's
exact-size `nn.Upsample(size=(Ly, Lx))` (modules/autoencoder2d.py:134) are
implemented as gathers with torch's index rule. Gathers of static index maps
compile to cheap XLA `gather`s.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def upsample_nearest_2x(x):
    """Nearest x2 on NHWC: out[i] = in[i // 2]. Uses repeat (fast path)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def _torch_nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    # torch: src = min(floor(i * (in/out)), in-1), computed in float.
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def resize_nearest_torch(x, out_h: int, out_w: int):
    """Exact-size nearest resize with torch index semantics on NHWC."""
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    if out_h % in_h == 0 and out_w % in_w == 0:
        # integer upscale: floor(i * in/out) == i // k — identical to
        # repeat(k), which lowers to broadcast+reshape instead of gathers
        if out_h != in_h:
            x = jnp.repeat(x, out_h // in_h, axis=1)
        if out_w != in_w:
            x = jnp.repeat(x, out_w // in_w, axis=2)
        return x
    hi = _torch_nearest_indices(out_h, in_h)
    wi = _torch_nearest_indices(out_w, in_w)
    x = jnp.take(x, jnp.asarray(hi), axis=1)
    x = jnp.take(x, jnp.asarray(wi), axis=2)
    return x
