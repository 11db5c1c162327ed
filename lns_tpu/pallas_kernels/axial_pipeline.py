"""FAB axial apply as a pipeline of layout-pinned Pallas kernels.

The XLA batched-matmul formulation of the axial applies emits SEVEN
full-tensor (928 MB at NS2d bench scale) layout copies: dots want
standard-major, the h<->w transpose and elementwise ops want batch-minor,
and layout assignment bridges with copies (HLO dump, DESIGN.md). Every op
here is a Pallas kernel with standard-major blocks, so no layout
bridging exists at all:

  bmm_blockdiag (row apply)  - grid (B, G, lane-tiles), one
      [gh, gh] @ [gh, TILE] MXU dot per step, no in-kernel relayouts
  transpose_hw               - grid (B, heads), one 3D sublane transpose
      per step (the only Mosaic-supported whole-slab permute, probed)
  bmm_blockdiag (col apply)  - as row apply on the transposed tensor
  transpose_hw (back)        - restores [b, n, h, w, d]

HBM traffic: 8 passes of the value tensor vs ~18 for the XLA formulation.
Instance norm stays in XLA (it fuses into the consumer projection).

MEASURED RESULT (round 2, v5e-via-axon — why this is NOT the default):
Pallas DMA sustains only ~260 GB/s on this stack vs XLA's 671
(benchmarks/probe_pallas_bw.py), so the pass-count advantage inverts:
84.9 ms NS2d decode vs 63.2 for the XLA path, and the standalone
transpose_hw runs at 99 GB/s. Kept as a validated library kernel for
stacks where Pallas DMA runs at full bandwidth (see DESIGN.md "Pallas on
this stack").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lns_tpu.pallas_kernels.axial_fused import blockdiag_embed


def _pick_batch(b: int, bytes_per_sample: int, target: int = 4 * 2**20) -> int:
    """Samples per grid step: big enough DMAs to amortize the per-step
    scalar-core overhead (~us each — a (B*heads)-step grid measured 71 ms
    for work whose HBM floor is ~7 ms), small enough to double-buffer."""
    s = max(1, target // max(1, bytes_per_sample))
    while b % s:
        s -= 1
    return s


def _bmm_kernel(k_ref, x_ref, o_ref, *, s, prec):
    for p in range(s):  # static unroll over the sample batch
        o_ref[p, 0] = jnp.dot(
            k_ref[p, 0], x_ref[p, 0], preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(o_ref.dtype)


def bmm_blockdiag(kb, x, interpret: bool = False):
    """Batched [B, G, M, M] @ [B, G, M, N], S samples per grid step."""
    b, g, m, n = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    s = _pick_batch(b, m * n * itemsize)
    f32_in = x.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT
    return pl.pallas_call(
        functools.partial(_bmm_kernel, s=s, prec=prec),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // s, g),
        in_specs=[
            pl.BlockSpec((s, 1, m, m), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1, m, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, 1, m, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(kb, x)


def _transpose_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (0, 1, 3, 2, 4))


def transpose_hw(x, interpret: bool = False):
    """[B, N, H, W, D] -> [B, N, W, H, D] in one HBM read + one write
    (sublane transpose per block of S samples x all heads).

    Mosaic's 5D-transpose lowering materializes ~20x block-size stack
    temporaries, so the per-step block target is kept small (2 MiB) and
    the scoped-VMEM limit raised toward the v5e 128M ceiling."""
    b, n, h, w, d = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    s = _pick_batch(b, n * h * w * d * itemsize, target=2 * 2**20)
    return pl.pallas_call(
        _transpose_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, w, h, d), x.dtype),
        grid=(b // s,),
        in_specs=[pl.BlockSpec((s, n, h, w, d), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((s, n, w, h, d), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x)


def axial_apply_pipeline(kx, ky, phi, group: int | None = None,
                         final_transpose: bool = True,
                         interpret: bool = False):
    """Axial kernel application, head-major, all-Pallas layout-pinned.

    kx: [B, heads, H, H]; ky: [B, heads, W, W]; phi: [B, heads, H, W, d]
    -> [B, heads, H, W, d] (or the w-major [B, heads, W, H, d] when
    `final_transpose=False` — the consumer can absorb the axis order in its
    einsum, saving one full HBM pass). Requires 8|H, 8|W (Mosaic merge
    alignment; see axial_fused.supported_shape).
    """
    b, heads, h, w, d = phi.shape
    if group is None:
        group = 1
        for g in (1, 2, 4, 8):
            if heads % g == 0 and g * min(h, w) <= 128:
                group = g
    gg = heads // group
    kxb = blockdiag_embed(kx.astype(phi.dtype), group)
    kyb = blockdiag_embed(ky.astype(phi.dtype), group)

    # row apply on [b, gg, (p h), (w d)] — contiguous reshape, no relayout
    x = phi.reshape(b, gg, group * h, w * d)
    x = bmm_blockdiag(kxb, x, interpret=interpret)
    # h <-> w swap as one pass
    x = transpose_hw(x.reshape(b, heads, h, w, d), interpret=interpret)
    # col apply on [b, gg, (p w), (h d)]
    x = x.reshape(b, gg, group * w, h * d)
    x = bmm_blockdiag(kyb, x, interpret=interpret)
    x = x.reshape(b, heads, w, h, d)
    if final_transpose:
        x = transpose_hw(x, interpret=interpret)
    return x
