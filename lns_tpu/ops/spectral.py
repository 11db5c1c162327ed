"""Spectral (FNO) convolutions, channels-last.

Matches the reference's SpectralConv1d/2d/3d (modules/basics.py:55-221):
rfft over spatial axes, truncate to the retained mode blocks, complex
weight contraction (2 banks in 2D for the +/- row modes, 4 banks in 3D),
irfft back. Weights are stored as real [..., 2] pairs exactly like the
reference (complex viewed at use time), which keeps torch-checkpoint
conversion a pure reshape.

TPU notes: XLA lowers FFTs natively; for the tiny retained-mode counts used
here (<= 16) the FFT is cheap relative to the conv stacks. The contraction
is an einsum that lands on the MXU.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lns_tpu.ops.initializers import uniform_scale_init


def batchmul1d(x_ft, w):
    """(b, m, i), (i, o, m) -> (b, m, o)  [channels-last]"""
    return jnp.einsum("bmi,iom->bmo", x_ft, w)


def batchmul2d(x_ft, w):
    """(b, mx, my, i), (i, o, mx, my) -> (b, mx, my, o)"""
    return jnp.einsum("bxyi,ioxy->bxyo", x_ft, w)


def batchmul3d(x_ft, w):
    """(b, mx, my, mz, i), (i, o, mx, my, mz) -> (b, mx, my, mz, o)"""
    return jnp.einsum("bxyzi,ioxyz->bxyzo", x_ft, w)


def _as_complex(w):
    return jax.lax.complex(w[..., 0], w[..., 1])


def _dft_row_basis(n: int, rows):
    """Truncated DFT analysis basis for the given frequency rows: returns
    (cos, sin) real matrices [n, len(rows)] with
    e^{-2 pi i k x / n} = cos - i sin."""
    x = np.arange(n)[:, None]
    k = np.asarray(rows)[None, :]
    ang = 2.0 * np.pi * x * k / n
    return np.cos(ang, dtype=np.float64).astype(np.float32), np.sin(ang, dtype=np.float64).astype(np.float32)


def spectral_conv2d_dft(x, w1, w2, modes1: int, modes2: int):
    """SpectralConv2d forward as pure matmuls (no FFT).

    For the tiny retained mode counts this architecture uses (<= 16), the
    truncated analysis/synthesis transforms are small dense matrices —
    MXU matmuls instead of FFT butterflies (SURVEY section 7 "DFT-as-matmul"
    note). Exactly equivalent to the rfft2-based path.

    x: [b, h, w, c]; w1/w2: [i, o, m1, m2, 2] real pairs.
    """
    b, h, w, c = x.shape
    m1, m2 = modes1, modes2
    rows = list(range(m1)) + [r % h for r in range(h - m1, h)]
    cols = list(range(m2))

    ch_c, ch_s = _dft_row_basis(h, rows)  # [h, 2*m1]
    cw_c, cw_s = _dft_row_basis(w, cols)  # [w, m2]
    ch_c, ch_s = jnp.asarray(ch_c), jnp.asarray(ch_s)
    cw_c, cw_s = jnp.asarray(cw_c), jnp.asarray(cw_s)

    xf = x.astype(jnp.float32)
    # analysis over rows: Xr = sum_h e^{-i..} x  -> complex [b, 2m1, w, c]
    xr_re = jnp.einsum("bhwc,hr->brwc", xf, ch_c)
    xr_im = -jnp.einsum("bhwc,hr->brwc", xf, ch_s)
    # analysis over cols
    xf_re = jnp.einsum("brwc,wk->brkc", xr_re, cw_c) + jnp.einsum("brwc,wk->brkc", xr_im, cw_s)
    xf_im = jnp.einsum("brwc,wk->brkc", xr_im, cw_c) - jnp.einsum("brwc,wk->brkc", xr_re, cw_s)

    # weight contraction per block (top rows -> w1, bottom rows -> w2)
    def apply_w(re, im, wk):
        wr, wi = wk[..., 0], wk[..., 1]
        out_re = (
            jnp.einsum("brkc,crko->brko", re, wr.transpose(0, 2, 3, 1))
            - jnp.einsum("brkc,crko->brko", im, wi.transpose(0, 2, 3, 1))
        )
        out_im = (
            jnp.einsum("brkc,crko->brko", re, wi.transpose(0, 2, 3, 1))
            + jnp.einsum("brkc,crko->brko", im, wr.transpose(0, 2, 3, 1))
        )
        return out_re, out_im

    top_re, top_im = apply_w(xf_re[:, :m1], xf_im[:, :m1], w1)
    bot_re, bot_im = apply_w(xf_re[:, m1:], xf_im[:, m1:], w2)
    o_re = jnp.concatenate([top_re, bot_re], axis=1)  # [b, 2m1, m2, o]
    o_im = jnp.concatenate([top_im, bot_im], axis=1)

    # synthesis: real irfft2 with hermitian completion over the col axis.
    # col factor 2 for 0 < k2 < w/2 (conjugate pair), 1 for k2=0 / nyquist.
    fac = np.full(m2, 2.0, np.float32)
    fac[0] = 1.0
    if w % 2 == 0 and m2 - 1 == w // 2:
        fac[-1] = 1.0
    o_re = o_re * jnp.asarray(fac)[None, None, :, None]
    o_im = o_im * jnp.asarray(fac)[None, None, :, None]

    # y[h, w'] = (1/(H W)) sum_r sum_k Re[(o_re + i o_im) e^{+i 2pi(rh/H + kw'/W)}]
    # rows synthesis (full complex), then cols with Re[] projection
    yr_re = jnp.einsum("brko,hr->bhko", o_re, ch_c) - jnp.einsum("brko,hr->bhko", o_im, ch_s)
    yr_im = jnp.einsum("brko,hr->bhko", o_im, ch_c) + jnp.einsum("brko,hr->bhko", o_re, ch_s)
    y = jnp.einsum("bhko,wk->bhwo", yr_re, cw_c) - jnp.einsum("bhko,wk->bhwo", yr_im, cw_s)
    return (y / (h * w)).astype(x.dtype)


class SpectralConv1d(nn.Module):
    """1D Fourier layer on [b, n, c] (reference: modules/basics.py:55-96)."""

    in_channels: int
    out_channels: int
    modes: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[1]
        scale = 1.0 / (self.in_channels * self.out_channels)
        w = self.param(
            "weights",
            uniform_scale_init(scale),
            (self.in_channels, self.out_channels, self.modes, 2),
            self.param_dtype,
        )
        x_ft = jnp.fft.rfft(x.astype(jnp.float32), axis=1)  # [b, n//2+1, c]
        out = batchmul1d(x_ft[:, : self.modes, :], _as_complex(w))
        out_ft = jnp.zeros((x.shape[0], n // 2 + 1, self.out_channels), dtype=out.dtype)
        out_ft = out_ft.at[:, : self.modes, :].set(out)
        y = jnp.fft.irfft(out_ft, n=n, axis=1)
        return y.astype(x.dtype)


class SpectralConv2d(nn.Module):
    """2D Fourier layer on [b, h, w, c] (reference: modules/basics.py:99-149).

    Retains rows [0:modes1] and [-modes1:] of the height spectrum and
    columns [0:modes2] of the (half) width spectrum, with separate weight
    banks for the two row blocks.
    """

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    param_dtype: jnp.dtype = jnp.float32
    use_dft_matmul: bool = False  # MXU matmul path (exact; wins for small modes)

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes1, self.modes2, 2)
        w1 = self.param("weights1", uniform_scale_init(scale), shape, self.param_dtype)
        w2 = self.param("weights2", uniform_scale_init(scale), shape, self.param_dtype)

        if self.use_dft_matmul:
            return spectral_conv2d_dft(x, w1, w2, self.modes1, self.modes2)

        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))  # [b, h, w//2+1, c]
        out_ft = jnp.zeros(
            (x.shape[0], h, w // 2 + 1, self.out_channels), dtype=x_ft.dtype
        )
        top = batchmul2d(x_ft[:, : self.modes1, : self.modes2, :], _as_complex(w1))
        bot = batchmul2d(x_ft[:, -self.modes1 :, : self.modes2, :], _as_complex(w2))
        # Sequential .set replicates torch's overwrite order if blocks overlap.
        out_ft = out_ft.at[:, : self.modes1, : self.modes2, :].set(top)
        out_ft = out_ft.at[:, -self.modes1 :, : self.modes2, :].set(bot)
        y = jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2))
        return y.astype(x.dtype)


class SpectralConv3d(nn.Module):
    """3D Fourier layer on [b, d, h, w, c] (reference: modules/basics.py:152-221)."""

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    modes3: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, h, w = x.shape[1], x.shape[2], x.shape[3]
        m1, m2, m3 = self.modes1, self.modes2, self.modes3
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, m1, m2, m3, 2)
        ws = [
            self.param(f"weights{i+1}", uniform_scale_init(scale), shape, self.param_dtype)
            for i in range(4)
        ]
        x_ft = jnp.fft.rfftn(x.astype(jnp.float32), axes=(1, 2, 3))
        out_ft = jnp.zeros(
            (x.shape[0], d, h, w // 2 + 1, self.out_channels), dtype=x_ft.dtype
        )
        blocks = [
            (slice(None, m1), slice(None, m2)),
            (slice(-m1, None), slice(None, m2)),
            (slice(None, m1), slice(-m2, None)),
            (slice(-m1, None), slice(-m2, None)),
        ]
        for wk, (s1, s2) in zip(ws, blocks):
            blk = batchmul3d(x_ft[:, s1, s2, :m3, :], _as_complex(wk))
            out_ft = out_ft.at[:, s1, s2, :m3, :].set(blk)
        y = jnp.fft.irfftn(out_ft, s=(d, h, w), axes=(1, 2, 3))
        return y.astype(x.dtype)
