"""Convolution wrappers (NHWC, HWIO kernels) with torch-compatible padding.

Zero padding rides `lax.conv_general_dilated` natively (no activation
copy); circular / half-periodic boundaries wrap-pad only their periodic
axis explicitly. Both map exactly to the torch behavior. 1x1 convs are
expressed as channel matmuls — on TPU these land directly on the MXU with
no im2col.

Covers the reference's Conv1d/2d/3d(padding_mode=...) usage and
HalfPeriodicConv2d (modules/autoencoder2d_half_periodic.py:26-52).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from lns_tpu.ops import initializers as tinit
from lns_tpu.ops.padding import pad_nd


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def _wrap_decompose_enabled(padding_mode: str) -> bool:
    """Whether to lower a 3x3 stride-1 wrap-padded conv as zero-pad conv +
    boundary strip corrections instead of materializing a wrap-padded
    activation copy.

    Measured (round 3, v5e): half-periodic decompose ('x'/'y': 2 strip
    convs) wins — SW rollout 85.2 -> 76.1 ms. The fully-circular 'xy'
    variant (4 strip convs + corner wrap concats) REGRESSES NS2d
    52.8 -> 61.4 ms at 64x64 — the extra small ops cost more than the
    saved pad copy. Default: half-periodic only.
    LNS_TPU_CONV_WRAP_DECOMPOSE: 'hp' (default) | '0' (off) | 'full'.
    """
    v = os.environ.get("LNS_TPU_CONV_WRAP_DECOMPOSE", "hp")
    if v == "0":
        return False
    if v == "full":
        return True
    return padding_mode != "circular"


def _wrap_corrections_2d(x, kernel, y, mode):
    """Add the wrapped-boundary contributions a both-axes zero-padded 3x3
    stride-1 conv missed (round 3: wrap-padded convs previously
    materialized a full padded copy of the activation — one extra HBM
    pass per conv at decode scale; the strips below are 1/H (1/W) of the
    conv's work and land via in-place dynamic-update-slice adds).

    mode: 'x' (W wraps), 'y' (H wraps), 'xy' (both). Row strips use
    kernel rows 0/2 and carry the full x-axis handling (circular for
    'xy', zero for 'y'); column strips use kernel cols 0/2 with zero
    y-handling — in 'xy' mode the corner cross-terms are covered exactly
    once by the row strips (kernel row 0/2, every column).
    """
    H, W = x.shape[1], x.shape[2]
    dn = _dim_numbers(2)
    if mode in ("y", "xy"):
        top_in = x[:, H - 1 : H]   # contributes to output row 0 via kernel row 0
        bot_in = x[:, 0:1]         # contributes to output row H-1 via kernel row 2
        if mode == "xy":
            top_in = jnp.concatenate(
                [top_in[:, :, W - 1 :], top_in, top_in[:, :, :1]], axis=2)
            bot_in = jnp.concatenate(
                [bot_in[:, :, W - 1 :], bot_in, bot_in[:, :, :1]], axis=2)
            xpad = (0, 0)
        else:
            xpad = (1, 1)
        ct = lax.conv_general_dilated(
            top_in, kernel[0:1], (1, 1), [(0, 0), xpad], dimension_numbers=dn)
        cb = lax.conv_general_dilated(
            bot_in, kernel[2:3], (1, 1), [(0, 0), xpad], dimension_numbers=dn)
        y = y.at[:, 0:1].add(ct.astype(y.dtype))
        y = y.at[:, H - 1 : H].add(cb.astype(y.dtype))
    if mode in ("x", "xy"):
        left_in = x[:, :, W - 1 : W]   # -> output col 0 via kernel col 0
        right_in = x[:, :, 0:1]        # -> output col W-1 via kernel col 2
        cl = lax.conv_general_dilated(
            left_in, kernel[:, 0:1], (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=dn)
        cr = lax.conv_general_dilated(
            right_in, kernel[:, 2:3], (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=dn)
        y = y.at[:, :, 0:1].add(cl.astype(y.dtype))
        y = y.at[:, :, W - 1 : W].add(cr.astype(y.dtype))
    return y


def _up2x_enabled() -> bool:
    """Fused nearest-2x-upsample + conv3x3 as one input-dilated conv.

    Measured (round 3, v5e, probe_upsample.py): the naive lowering
    (materialize the 4x-size nearest-upsampled activation, then conv)
    costs 4.14 ms at [928,32,32,64]->[.,64,64,.] and 6.33 ms at
    [336,48,96,64]->[.,96,192,.]; the input-dilated conv with the
    box-convolved 4x4 kernel (K4 = conv(K, ones(2)) per axis) computes
    the identical function in 1.51 / 2.26 ms — XLA's TPU emitter handles
    lhs_dilation without materializing the stuffed tensor. An explicit
    4-phase sub-pixel decomposition ties with naive (the interleave copy
    eats the flop savings). LNS_TPU_CONV_UP2X=0 restores the naive path.
    """
    return os.environ.get("LNS_TPU_CONV_UP2X", "1") != "0"


def _up2x_conv(x, kernel, padding_mode):
    """nearest-2x upsample + 3x3 stride-1 pad-1 conv, lowered as a single
    lhs-dilated conv over the SMALL grid (see _up2x_enabled for numbers).
    Reference op pair being fused: modules/basics.py:279-299 (Upsample2D:
    nn.Upsample(nearest, 2x) + Conv2d(3, padding=1)) and the decoders'
    final resize->conv (modules/autoencoder2d.py decoder tail).

    Identity: with u = nearest2x(x) = box2 * stuff2(x),
    K * u = (K * box2) * stuff2(x), and K4 = K * box2 has per-axis taps
    [K0, K0+K1, K1+K2, K2]. Zero-padded axes use pad (2, 2) on the dilated
    input; periodic axes wrap-pad x by ONE small-grid pixel on each side
    (u's one-pixel wrap is exactly x's) and use pad (0, 0).
    """
    k4 = jnp.zeros((4, 4) + kernel.shape[2:], kernel.dtype)
    for dp in range(2):
        for dq in range(2):
            k4 = k4.at[dp : dp + 3, dq : dq + 3].add(kernel)
    wrap_h = padding_mode in ("circular", "half_periodic_y")
    wrap_w = padding_mode in ("circular", "half_periodic_x")
    if wrap_h:
        x = jnp.concatenate([x[:, -1:], x, x[:, :1]], axis=1)
    if wrap_w:
        x = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]], axis=2)
    pads = [(0, 0) if wrap_h else (2, 2), (0, 0) if wrap_w else (2, 2)]
    return lax.conv_general_dilated(
        x, k4, (1, 1), pads, lhs_dilation=(2, 2),
        dimension_numbers=_dim_numbers(2))


def _dim_numbers(num_spatial: int):
    # ('NHWC', 'HWIO', 'NHWC') generalized to N spatial dims
    spatial = "DHW"[-num_spatial:] if num_spatial <= 3 else None
    assert spatial is not None
    lhs = "N" + spatial + "C"
    rhs = spatial + "IO"
    return lax.conv_dimension_numbers((0,) * (num_spatial + 2), (0,) * (num_spatial + 2), (lhs, rhs, lhs))


class ConvND(nn.Module):
    """torch.nn.Conv{1,2,3}d equivalent on channels-last data.

    padding_mode: 'zeros' | 'circular' | 'half_periodic_x' | 'half_periodic_y'
    padding: int or per-axis (lo, hi) pairs. For symmetric int p the pad is
    (p, p) on every spatial axis (torch semantics).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    num_dimensions: int = 2
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[Tuple[int, int]]] = 0
    dilation: Union[int, Sequence[int]] = 1
    padding_mode: str = "zeros"
    use_bias: bool = True
    upsample_2x: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Optional[callable] = None
    bias_init: Optional[callable] = None

    @nn.compact
    def __call__(self, x):
        nd = self.num_dimensions
        ks = _tuple(self.kernel_size, nd)
        stride = _tuple(self.stride, nd)
        dil = _tuple(self.dilation, nd)
        in_ch = x.shape[-1]

        kernel = self.param(
            "kernel",
            self.kernel_init or tinit.torch_conv_kernel_init,
            ks + (in_ch, self.features),
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            fan_in = in_ch
            for k in ks:
                fan_in *= k
            binit = self.bias_init or tinit.torch_conv_bias_init(fan_in)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)

        if isinstance(self.padding, int):
            pads = [(self.padding, self.padding)] * nd
        else:
            pads = [tuple(p) for p in self.padding]

        if self.upsample_2x:
            # Semantics: nearest-2x upsample of x, then the conv below.
            if (
                nd == 2 and ks == (3, 3) and stride == (1, 1)
                and dil == (1, 1) and list(pads) == [(1, 1), (1, 1)]
                and self.padding_mode in ("zeros", "circular",
                                          "half_periodic_x",
                                          "half_periodic_y")
                and _up2x_enabled()
            ):
                dtype = self.dtype or x.dtype
                out = _up2x_conv(
                    x.astype(dtype),
                    kernel.astype(dtype),
                    self.padding_mode,
                ).astype(dtype)
                if bias is not None:
                    out = out + bias.astype(dtype)
                return out
            # fallback: materialize the nearest-2x upsample
            for ax in range(1, nd + 1):
                x = jnp.repeat(x, 2, axis=ax)

        # Zero padding rides the convolution natively (lax padding pairs)
        # instead of materializing a jnp.pad copy of the activation — a
        # full HBM pass per conv at decode scale. Only circular axes need
        # an explicit wrap-pad copy.
        conv_pads = [(0, 0)] * nd
        decompose = None
        if any(p != (0, 0) for p in pads):
            if self.padding_mode == "zeros":
                conv_pads = pads
            elif (
                self.padding_mode in ("circular", "half_periodic_x",
                                      "half_periodic_y")
                and nd == 2 and stride == (1, 1) and dil == (1, 1)
                and ks == (3, 3) and list(pads) == [(1, 1), (1, 1)]
                and x.shape[1] >= 3 and x.shape[2] >= 3
                and _wrap_decompose_enabled(self.padding_mode)
            ):
                # 3x3 stride-1 wrap-padded convs: zero-pad conv + boundary
                # strip corrections instead of materializing a wrap-padded
                # activation copy (see _wrap_corrections_2d)
                decompose = {"circular": "xy", "half_periodic_x": "x",
                             "half_periodic_y": "y"}[self.padding_mode]
                conv_pads = [(1, 1), (1, 1)]
            elif self.padding_mode == "circular":
                x = pad_nd(x, pads, mode="circular")
            elif self.padding_mode in ("half_periodic_x", "half_periodic_y"):
                assert nd == 2 and all(p[0] == p[1] for p in pads) and pads[0] == pads[1]
                p = pads[0][0]
                if self.padding_mode[-1] == "x":
                    x = jnp.pad(x, [(0, 0), (0, 0), (p, p), (0, 0)], mode="wrap")
                    conv_pads = [(p, p), (0, 0)]
                else:
                    x = jnp.pad(x, [(0, 0), (p, p), (0, 0), (0, 0)], mode="wrap")
                    conv_pads = [(0, 0), (p, p)]
            else:
                raise ValueError(f"unknown padding mode {self.padding_mode}")

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        dn = _dim_numbers(nd)
        # NOTE: no preferred_element_type=f32 here — the MXU accumulates
        # bf16 convs in f32 regardless and the output is cast to `dtype`
        # immediately, while the flag makes jax's conv VJP build a
        # mixed-dtype transposed conv (TypeError under grad).
        out = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=stride,
            padding=conv_pads,
            rhs_dilation=dil,
            dimension_numbers=dn,
        )
        out = out.astype(dtype)
        if decompose is not None:
            out = _wrap_corrections_2d(x, kernel, out, decompose)
        if bias is not None:
            out = out + bias.astype(dtype)
        return out


class Conv1x1(nn.Module):
    """Pointwise conv as a channel matmul (pure MXU work on TPU)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Optional[callable] = None
    bias_init: Optional[callable] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # Kernel stored as a plain (I, O) matrix; torch fan_in = in_ch.
        kernel = self.param(
            "kernel",
            self.kernel_init or tinit.torch_linear_kernel_init,
            (in_ch, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        out = jnp.einsum(
            "...i,io->...o",
            x.astype(dtype),
            kernel.astype(dtype),
            preferred_element_type=jnp.float32 if dtype == jnp.bfloat16 else None,
        ).astype(dtype)
        if self.use_bias:
            binit = self.bias_init or tinit.torch_linear_bias_init(in_ch)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            out = out + bias.astype(dtype)
        return out


class HalfPeriodicConv2d(nn.Module):
    """Conv2d with circular padding along ``periodic_direction`` and zero
    padding along the other axis (reference:
    modules/autoencoder2d_half_periodic.py:26-52)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    periodic_direction: str = "x"
    use_bias: bool = True
    upsample_2x: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return ConvND(
            features=self.features,
            kernel_size=self.kernel_size,
            num_dimensions=2,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            padding_mode=f"half_periodic_{self.periodic_direction}",
            use_bias=self.use_bias,
            upsample_2x=self.upsample_2x,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class Dense(nn.Module):
    """torch.nn.Linear equivalent (torch default init unless overridden)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Optional[callable] = None
    bias_init: Optional[callable] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kinit = self.kernel_init or tinit.torch_linear_kernel_init
        kernel = self.param("kernel", kinit, (in_ch, self.features), self.param_dtype)
        dtype = self.dtype or x.dtype
        out = jnp.einsum("...i,io->...o", x.astype(dtype), kernel.astype(dtype)).astype(dtype)
        if self.use_bias:
            binit = self.bias_init or tinit.torch_linear_bias_init(in_ch)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            out = out + bias.astype(dtype)
        return out
