"""Fused axial low-rank kernel application (the FABlock2D hot path).

Computes, per sample and head,

    out[i, l, d] = sum_m K_y[l, m] * sum_j K_x[i, j] * phi[j, m, d]

i.e. the reference einsum pair 'bhij,bhcjm->bhcim' + 'bhlm,bhcim->bhcil'
(factorized_attention.py:156-159) as ONE Pallas kernel per (sample, head):
the [H, W, d] head-slab lives in VMEM, both contractions run as chains of
2D MXU dots, and HBM sees exactly one read + one write of phi.

Why not XLA: the equivalent batched dot_generals (~7k tiny matmuls over
GB-scale tensors) run ~5x slower (layout transposes dominate) and push XLA
compile time to minutes.

Layout contract: `phi` arrives HEAD-MAJOR [B*heads, H, W, d]. The caller
folds the (channel -> head-major) relayout into the producing/consuming
1x1-conv matmuls (see FABlock2D), so no standalone transpose is paid.
Mosaic constraints honored: full-lane (=d) blocks only — no lane-offset
matmul operands (miscompiled as of jax 0.9), no in-kernel reshapes, only
leading/middle-dynamic ref indexing and a 3D sublane transpose, all of
which are probe-verified on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axial_kernel(kx_ref, ky_ref, phi_ref, o_ref, s1, s2, s3):
    h = phi_ref.shape[1]
    w = phi_ref.shape[2]
    kx = kx_ref[0]  # [H, H]
    ky = ky_ref[0]  # [W, W]

    # For f32 operands HIGHEST forces the 3-pass bf16 decomposition on the
    # MXU (Pallas dots otherwise run single-pass bf16 regardless of input
    # dtype); for bf16 operands HIGHEST is rejected ("Bad lhs type") — the
    # single pass is already exact for bf16 inputs with f32 accumulation.
    f32_in = phi_ref.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT

    # step 1 (columns): s1[j, l, d] = sum_m ky[l, m] phi[j, m, d]
    # All dynamic ref indices are on the LEADING dim (dynamic sublane
    # indexing is not provably aligned for <32-bit dtypes); the j<->l swap
    # between the loops is a whole-block 3D sublane transpose.
    def row_body(j, _):
        s1[j, :, :] = jnp.dot(
            ky, phi_ref[0, j, :, :], preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(s1.dtype)
        return 0

    jax.lax.fori_loop(0, h, row_body, 0)
    s2[...] = jnp.transpose(s1[...], (1, 0, 2))  # [l, j, d]

    # step 2 (rows): s3[l, i, d] = sum_j kx[i, j] s2[l, j, d]
    def col_body(l, _):
        s3[l, :, :] = jnp.dot(
            kx, s2[l, :, :], preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(s3.dtype)
        return 0

    jax.lax.fori_loop(0, w, col_body, 0)
    # s3 is [l, i, d]; store as [i, l, d]
    o_ref[0] = jnp.transpose(s3[...], (1, 0, 2))


def axial_kernel_apply_headmajor(kx, ky, phi, interpret: bool = False):
    """kx: [G, H, H], ky: [G, W, W], phi: [G, H, W, d] with G = B*heads."""
    g, h, w, d = phi.shape
    return pl.pallas_call(
        _axial_kernel,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, h, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, w, d), phi.dtype),
            pltpu.VMEM((w, h, d), phi.dtype),
            pltpu.VMEM((w, h, d), phi.dtype),
        ],
        interpret=interpret,
    )(kx, ky, phi)


def axial_kernel_apply(kx, ky, phi, heads: int, interpret: bool = False):
    """Channel-interleaved convenience wrapper.

    kx: [B, heads, H, H]; ky: [B, heads, W, W]; phi: [B, H, W, heads*d]
    (head, d) channel order -> same shape out. Pays one relayout each way;
    prefer the head-major entry point + fused producer/consumer matmuls
    (FABlock2D does).
    """
    b, h, w, c = phi.shape
    d = c // heads
    phi5 = phi.reshape(b, h, w, heads, d).transpose(0, 3, 1, 2, 4)
    out = axial_kernel_apply_headmajor(
        kx.reshape(b * heads, h, h),
        ky.reshape(b * heads, w, w),
        phi5.reshape(b * heads, h, w, d),
        interpret=interpret,
    )
    out = out.reshape(b, heads, h, w, d).transpose(0, 2, 3, 1, 4)
    return out.reshape(b, h, w, c)
