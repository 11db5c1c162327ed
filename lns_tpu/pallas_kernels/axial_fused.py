"""Fused FABlock2D core: axial kernel applications + instance norm in ONE
Pallas kernel — one HBM read and one HBM write of the value tensor.

Computes, head-major, the reference einsum pair
'bhij,bhcjm->bhcim' + 'bhlm,bhcim->bhcil' (factorized_attention.py:156-159)
followed by InstanceNorm over (H, W) per (batch, head, d) channel.

Design (probed on v5e, benchmarks/probe_mosaic.py):
  * Mosaic rejects lane-merge/split reshapes ((w, d) <-> (w*d)) and rank-3
    dot_general operands, but supports 4D sublane transposes and dynamic
    LEADING-dim ref indexing. So the kernel keeps d (=64) as the lane dim
    throughout and contracts via per-slice 2D dots.
  * Per grid step (one sample x one head-group of `g` heads):
      transpose [g,H,W,d] -> [W, g*H, d]; for each w: dot(blockdiag Kx
      [g*H, g*H], slab [g*H, d]); transpose back to [H, g*W, d]; for each
      h: dot(blockdiag Ky, slab); instance-norm stats in f32 over (H, W).
  * Block-diagonal packing turns the per-head [n, n] kernels (n <= 96,
    MXU-starving) into [g*n, g*n] contractions with full(er) MXU tiles;
    the structural-zero MACs are cheaper than the 8x launch count.
  * The blockdiag embeddings are built OUTSIDE by XLA (tiny tensors).

HBM traffic per FAB block: read phi + write out = 2 passes, vs ~10+ passes
for the XLA batched-matmul formulation (measured 29 ms -> see DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def blockdiag_embed(k, group: int):
    """[B, heads, n, n] -> [B, heads//group, group*n, group*n] block-diagonal
    embedding (XLA-side; tiny)."""
    b, heads, n, _ = k.shape
    gg = heads // group
    k5 = k.reshape(b, gg, group, n, n)
    eye = jnp.eye(group, dtype=k.dtype)
    out = jnp.einsum("bgpij,pq->bgpiqj", k5, eye)
    return out.reshape(b, gg, group * n, group * n)


def _vmem_estimate(g: int, h: int, w: int, d: int, itemsize: int) -> int:
    """Scoped-VMEM estimate per grid step. The in-kernel transposes lower to
    many slab-sized stack temporaries beyond the declared scratches —
    measured ~31 slab-equivalents at [4,8,48,96,64]/bf16 on v5e; 36 used as
    the planning factor."""
    slab = g * h * w * d * itemsize
    kmat = 2 * ((g * h) ** 2 + (g * w) ** 2) * itemsize
    return 36 * slab + kmat


def pick_group(heads: int, h: int, w: int, d: int, itemsize: int = 2,
               vmem_budget: int = 56 * 2**20) -> int:
    """Smallest head-group g (dividing `heads`) that brings the blockdiag
    contractions to full MXU row tiles (g*min(h,w) >= 128), subject to the
    VMEM budget. Larger g only adds structural-zero MACs."""
    best = 1
    for g in (1, 2, 4, 8):
        if heads % g or _vmem_estimate(g, h, w, d, itemsize) > vmem_budget:
            continue
        best = g
        if g * min(h, w) >= 128:
            break
    return best


def _fab_kernel(kx_ref, ky_ref, phi_ref, o_ref, xt, s1t, s2, *, g, h, w, d,
                eps, with_in):
    f32_in = phi_ref.dtype == jnp.float32
    # f32 operands: HIGHEST forces exact 3-pass f32 on the MXU (Pallas dots
    # otherwise run single-pass bf16); bf16 operands: single pass + f32
    # accumulation is already exact.
    prec = jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT
    kx = kx_ref[0, 0]  # [g*h, g*h]
    ky = ky_ref[0, 0]  # [g*w, g*w]

    x = phi_ref[0]  # [g, h, w, d]
    xt[...] = jnp.transpose(x, (2, 0, 1, 3)).reshape(w, g * h, d)

    def row_body(wi, _):
        s1 = jnp.dot(kx, xt[wi], preferred_element_type=jnp.float32,
                     precision=prec).astype(xt.dtype)
        # stash row-applied slabs back in xt's slot layout via s1t later;
        # write into xt is safe: slab wi is never read again
        xt[wi] = s1
        return 0

    jax.lax.fori_loop(0, w, row_body, 0)

    # [w, g, h, d] -> [h, g, w, d] -> [h, g*w, d]
    s1t[...] = jnp.transpose(
        xt[...].reshape(w, g, h, d), (2, 1, 0, 3)
    ).reshape(h, g * w, d)

    def col_body(hi, _):
        s2[hi] = jnp.dot(ky, s1t[hi], preferred_element_type=jnp.float32,
                         precision=prec).astype(s2.dtype)
        return 0

    jax.lax.fori_loop(0, h, col_body, 0)

    y = s2[...].reshape(h, g, w, d)
    if with_in:
        # InstanceNorm2d: per (head, d) channel over (h, w); stats
        # accumulate in f32. f32 inputs use the two-pass (numerically exact)
        # form; bf16 avoids materializing an f32 slab copy via E[x^2]-E[x]^2
        # with f32 accumulation (error << bf16 activation rounding).
        mean = jnp.mean(y, axis=(0, 2), keepdims=True, dtype=jnp.float32)
        if f32_in:
            var = jnp.mean(jnp.square(y - mean), axis=(0, 2), keepdims=True)
        else:
            sq = jnp.mean(jnp.square(y), axis=(0, 2), keepdims=True,
                          dtype=jnp.float32)
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        y = (y - mean.astype(y.dtype)) * inv.astype(y.dtype)
    o_ref[0] = jnp.transpose(y, (1, 0, 2, 3)).astype(o_ref.dtype)


def supported_shape(h: int, w: int, d: int) -> bool:
    """Mosaic rejects the kernel's leading->sublane merges when the spatial
    dims aren't 8-aligned (probed: 15x30 fails 'unsupported shape cast';
    16/24/32/48/96 compile). d must fill half a lane register or more."""
    return h % 8 == 0 and w % 8 == 0 and d % 64 == 0


def fab_axial_in_fused(kx, ky, phi, group: int | None = None,
                       with_instance_norm: bool = True, eps: float = 1e-5,
                       interpret: bool = False):
    """Fused axial apply (+ optional instance norm), head-major.

    kx: [B, heads, H, H]; ky: [B, heads, W, W]; phi: [B, heads, H, W, d]
    -> [B, heads, H, W, d].
    """
    b, heads, h, w, d = phi.shape
    if not supported_shape(h, w, d):
        raise ValueError(f"unsupported FAB shape for the fused kernel: "
                         f"h={h}, w={w}, d={d} (need 8|h, 8|w, 64|d)")
    if group is None:
        group = pick_group(heads, h, w, d, jnp.dtype(phi.dtype).itemsize)
    gg = heads // group
    kxb = blockdiag_embed(kx.astype(phi.dtype), group)  # [B, gg, g*h, g*h]
    kyb = blockdiag_embed(ky.astype(phi.dtype), group)  # [B, gg, g*w, g*w]

    kernel = functools.partial(
        _fab_kernel, g=group, h=h, w=w, d=d, eps=eps,
        with_in=with_instance_norm,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, heads, h, w, d), phi.dtype),
        grid=(b, gg),
        in_specs=[
            pl.BlockSpec((1, 1, group * h, group * h),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group * w, group * w),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, h, w, d),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, h, w, d),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w, group * h, d), phi.dtype),
            pltpu.VMEM((h, group * w, d), phi.dtype),
            pltpu.VMEM((h, group * w, d), phi.dtype),
        ],
        # transposes cost many slab-sized stack temporaries beyond the
        # declared scratches (measured ~36x slab for bf16 at g=4); raise the
        # scoped limit well past them (v5e VMEM is 128M; default scope 16M)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(kxb, kyb, phi)
    return out
