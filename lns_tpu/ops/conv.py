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

        # Zero padding rides the convolution natively (lax padding pairs)
        # instead of materializing a jnp.pad copy of the activation — a
        # full HBM pass per conv at decode scale. Only circular axes need
        # an explicit wrap-pad copy.
        conv_pads = [(0, 0)] * nd
        if any(p != (0, 0) for p in pads):
            if self.padding_mode == "zeros":
                conv_pads = pads
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
