"""Fused axial low-rank kernel application (the FABlock2D hot path).

Computes, per sample and head,

    out[i, l, d] = sum_m K_y[l, m] * sum_j K_x[i, j] * phi[j, m, d]

i.e. the reference einsum pair 'bhij,bhcjm->bhcim' + 'bhlm,bhcim->bhcil'
(factorized_attention.py:156-159), as ONE Pallas kernel: the [H, W, d]
head-slab lives in VMEM, both tiny matmuls hit the MXU back to back, and
HBM sees exactly one read + one write of phi.

Why not XLA: the equivalent batched dot_generals ((batch*heads) ~ 7k tiny
matmuls) both run ~5x slower (layout transposes of GB-scale tensors) and
blow XLA compile time up to minutes.

Heads are packed so the channel block is a full 128-lane tile
(heads_per_block = max(1, 128 // d)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axial_kernel(kx_ref, ky_ref, phi_ref, o_ref, scratch, scratch2, *, hp: int, d: int):
    # Mosaic supports only 2D dots, so both axial applications run as static
    # loops of row-sliced 2D matmuls — everything stays in VMEM, so the loop
    # costs no HBM traffic:
    #   step 1: s1[j, l, d] = sum_m ky[l, m] phi[j, m, d]   (per row j)
    #   step 2: out[i, l, d] = sum_j kx[i, j] s1[j, l, d]   (per column l)
    h = phi_ref.shape[1]
    w = phi_ref.shape[2]

    # One pass of each loop covers all packed heads (sequential per-head
    # loop pairs exposed a Mosaic scheduling hazard between the loops).
    def row_body(j, _):
        for t in range(hp):
            phi_j = phi_ref[0, j, :, t * d : (t + 1) * d]  # [W(m), d]
            scratch[j, :, t * d : (t + 1) * d] = jnp.dot(
                ky_ref[0, t], phi_j, preferred_element_type=jnp.float32
            ).astype(scratch.dtype)  # [l, d]
        return 0

    jax.lax.fori_loop(0, h, row_body, 0)

    def col_body(l, _):
        for t in range(hp):
            s1_l = scratch[:, l, t * d : (t + 1) * d]  # [H(j), d]
            scratch2[l, :, t * d : (t + 1) * d] = jnp.dot(
                kx_ref[0, t], s1_l, preferred_element_type=jnp.float32
            ).astype(scratch2.dtype)  # [i, d]
        return 0

    jax.lax.fori_loop(0, w, col_body, 0)
    # scratch2 is [l, i, c]; store the whole block as [i, l, c]
    o_ref[0] = jnp.transpose(scratch2[...], (1, 0, 2))


def axial_kernel_apply(kx, ky, phi, heads: int, interpret: bool = False):
    """Apply per-head axial kernels.

    kx:  [B, heads, H, H]   row kernels
    ky:  [B, heads, W, W]   column kernels
    phi: [B, H, W, heads*d] values, (head, d) channel order
    -> same shape as phi.
    """
    b, h, w, c = phi.shape
    d = c // heads
    hp = max(1, min(heads, 128 // d))
    while heads % hp:
        hp -= 1
    n_hblk = heads // hp

    kernel = functools.partial(_axial_kernel, hp=hp, d=d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        grid=(b, n_hblk),
        in_specs=[
            pl.BlockSpec((1, hp, h, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, w, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, hp * d), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, hp * d), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((h, w, hp * d), phi.dtype),
            pltpu.VMEM((w, h, hp * d), phi.dtype),
        ],
        interpret=interpret,
    )(kx, ky, phi)
