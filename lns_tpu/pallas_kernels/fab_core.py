"""Two-pass Pallas FAB core: apply-pair + Gram stats with NO materialized
value tensor (round 5; VERDICT r4 item 1).

The factorized-attention block's cost on this chip is the head-major value
tensor bb = K_x (K_y u) — 121 MB per 116-frame NS2d chunk, 15.9 GB per SW
rollout — which the XLA formulation (`FABlock2D._batched_gram_core`) must
write once and read twice (Gram statistics + out-projection), plus the
inter-apply relayout copy XLA re-inserts no matter how the einsums are
written (BASELINE.md round-4 attempts a-e). This module removes that tensor
from HBM entirely:

  pass 1 (stats):  per (b, head): compute bb tile in VMEM, reduce it to its
                   Gram matrix G = bb^T bb and spatial sum S, DISCARD bb.
  XLA (tiny):      recover the InstanceNorm statistics of the
                   never-materialized phi = bb @ W_in from G and S exactly
                   (the `_gram_core` math), fold in_proj + IN + out_fc1 into
                   per-(b, head) c->o matrices m and a bias.
  pass 2 (apply):  recompute the same bb tile in VMEM (bit-identical dots),
                   contract with m on the fly, accumulate over heads in a
                   VMEM scratch, write ONLY the [b, h, w, o] projection.

Per block the only big-tensor HBM traffic is u in (twice) and the output —
~45 MB/chunk for NS2d vs ~620 MB for the XLA core — at the price of
computing the (MXU-starved but small) apply pair twice. This also sidesteps
the measured ~260 GB/s Pallas DMA ceiling on this stack (DESIGN.md "Pallas
on this stack"): there is almost nothing left to DMA.

Mosaic constraints shape the kernel (measured on this stack, round 5):
in-kernel `swapaxes` and any reshape that re-tiles sub-128-lane dims hang or
crash the remote compiler, so the chain is expressed purely as rank-3
`dot_general`s in channel-major layout, two variants:

  a4: u arrives [b, c, h, w];  A = ky . u  (rhs-minor)  -> [l, c, h]
                               B = kx . A  (rhs-minor)  -> [i, l, c]
      proj: B . m (lhs-minor contraction)               -> [i, l, o]
  a3: u arrives [b, c, h, w];  A = u . ky  (lhs-minor)  -> [c, h, l]
                               B = A . kx  (lhs-interior)-> [c, l, i]
      proj: B . m (lhs-MAJOR contraction)               -> [l, i, o]

(the lhs-minor class is confirmed supported on this stack; the others are
selected by measurement — see benchmarks/probe_fab_mega.py). Each program
processes `block_b` samples (python-unrolled) so per-program overhead
amortizes: grid (b / block_b, heads), heads fastest, so the u block is
fetched once per sample block and reused across heads.

Reference kernel being beaten: the decode-inside-the-loop rollout at
/root/reference/train_stage2_ns2d.py:143-158 via
modules/factorized_attention.py:97-160.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dg(a, b, dims, dtype=None):
    out = jax.lax.dot_general(a, b, (dims, ((), ())),
                              preferred_element_type=jnp.float32)
    return out if dtype is None else out.astype(dtype)


def _apply_pair(u_cm, kx, ky, variant):
    """bb from one c-major u tile. u_cm: [c, h, w]; kx: [i, h]; ky: [l, w].
    Returns bb as [i, l, c] ('a4') or [c, l, i] ('a3') — same values of
    bb[spatial-h, spatial-w, c] either way. Intermediates stay in the
    activation dtype between the two dots, like the XLA core."""
    dt = u_cm.dtype
    if variant == "a4":
        # contract w (minor of rhs): [l, w] . [c, h, w] -> [l, c, h]
        a = _dg(ky, u_cm, ((1,), (2,)), dt)
        # contract h (minor of rhs): [i, h] . [l, c, h] -> [i, l, c]
        return _dg(kx, a, ((1,), (2,)), dt)
    # a3: contract w (minor of lhs): [c, h, w] . [l, w] -> [c, h, l]
    a = _dg(u_cm, ky, ((2,), (1,)), dt)
    # contract h (interior of lhs): [c, h, l] . [i, h] -> [c, l, i]
    return _dg(a, kx, ((1,), (1,)), dt)


def _stats_kernel(u_ref, kx_ref, ky_ref, g_ref, s_ref, *, variant, block_b):
    for p in range(block_b):
        bb = _apply_pair(u_ref[p], kx_ref[p, 0], ky_ref[p, 0], variant)
        if variant == "a4":
            # bb [i, l, c]: Gram over both spatial dims -> [c, c]
            g = _dg(bb, bb, ((0, 1), (0, 1)))
            # spatial sums -> [1, 1, c] -> [1, c]
            s = jnp.sum(jnp.sum(bb.astype(jnp.float32), axis=0,
                                keepdims=True), axis=1, keepdims=True)[0]
        else:
            # bb [c, l, i]
            g = _dg(bb, bb, ((1, 2), (1, 2)))
            s3 = jnp.sum(jnp.sum(bb.astype(jnp.float32), axis=2,
                                 keepdims=True), axis=1, keepdims=True)
            s = s3[:, :, 0]                        # [c, 1]
        g_ref[p, 0] = g
        s_ref[p, 0] = s                # [1, c] ('a4') or [c, 1] ('a3')


def _apply_kernel(u_ref, kx_ref, ky_ref, m_ref, bias_ref, o_ref, acc_ref,
                  *, variant, n_heads, block_b):
    jn = pl.program_id(1)
    for p in range(block_b):
        bb = _apply_pair(u_ref[p], kx_ref[p, 0], ky_ref[p, 0], variant)
        m = m_ref[p, 0]                # [c, o]
        if variant == "a4":
            # bb [i, l, c] . m [c, o] (lhs-minor) -> [i, l, o]
            t = _dg(bb, m, ((2,), (0,)))
        else:
            # bb [c, l, i] . m [c, o] (lhs-MAJOR both) -> [l, i, o]
            t = _dg(bb, m, ((0,), (0,)))

        @pl.when(jn == 0)
        def _():
            acc_ref[p] = t

        @pl.when(jn > 0)
        def _():
            acc_ref[p] += t

        @pl.when(jn == n_heads - 1)
        def _():
            o_ref[p] = (acc_ref[p] - bias_ref[p]).astype(o_ref.dtype)


def _pick_block_b(b: int, default: int = 29) -> int:
    """Largest divisor of b that is <= default (amortizes per-program
    overhead without oversizing VMEM)."""
    bs = min(default, b)
    while b % bs:
        bs -= 1
    return bs


def _io_specs(c, h, w, bs):
    return [
        pl.BlockSpec((bs, c, h, w), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, 1, h, h), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, 1, w, w), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit,
                   static_argnames=("variant", "block_b", "interpret"))
def fab_gram_stats(u_cm, kx, ky, variant: str = "a4", block_b: int = 0,
                   interpret: bool = False):
    """Pass 1. u_cm: [b, c, h, w]; kx: [b, n, h, h]; ky: [b, n, w, w].
    Returns (G [b, n, c, c] f32, S [b, n, 1, c] f32) of the never-written
    bb = K_x (K_y u) — Gram over both spatial dims and spatial sums."""
    b, c, h, w = u_cm.shape
    n = kx.shape[1]
    bs = block_b or _pick_block_b(b)
    s_block = (bs, 1) + ((1, c) if variant == "a4" else (c, 1))
    g, s = pl.pallas_call(
        functools.partial(_stats_kernel, variant=variant, block_b=bs),
        grid=(b // bs, n),
        in_specs=_io_specs(c, h, w, bs),
        out_specs=[
            pl.BlockSpec((bs, 1, c, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s_block, lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n) + s_block[2:], jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(u_cm, kx, ky)
    if variant != "a4":
        s = jnp.swapaxes(s, 2, 3)      # [b, n, c, 1] -> [b, n, 1, c] (XLA)
    return g, s


@functools.partial(jax.jit,
                   static_argnames=("variant", "block_b", "interpret"))
def fab_apply_proj(u_cm, kx, ky, m, bias, variant: str = "a4",
                   block_b: int = 0, interpret: bool = False):
    """Pass 2. m: [b, n, c, o]; bias: [b, 1, o]. Recomputes bb per
    (b, head) and contracts with m on the fly, head-accumulated in VMEM.
    Returns [b, h, w, o] ('a4') or [b, w, h, o] ('a3' — caller swaps)."""
    b, c, h, w = u_cm.shape
    n = kx.shape[1]
    o = m.shape[-1]
    bs = block_b or _pick_block_b(b)
    out_sp = (h, w) if variant == "a4" else (w, h)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, variant=variant, n_heads=n,
                          block_b=bs),
        grid=(b // bs, n),
        in_specs=_io_specs(c, h, w, bs) + [
            pl.BlockSpec((bs, 1, c, o), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1, o), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs,) + out_sp + (o,),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b,) + out_sp + (o,), u_cm.dtype),
        scratch_shapes=[pltpu.VMEM((bs,) + out_sp + (o,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(u_cm, kx, ky, m, bias)
    return out


def fab_two_pass_core(u, k_x, k_y, w_in, w_o1, eps: float = 1e-5,
                      variant: str = "a4", block_b: int = 0,
                      interpret: bool = False):
    """Drop-in replacement for FABlock2D._batched_gram_core (same inputs,
    same [b, h, w, o] output, same math): apply pair + InstanceNorm-folded
    out-projection with the head-major value tensor never leaving VMEM.

    u: [b, h, w, c] (post-GN); k_x: [b, n, h, h]; k_y: [b, n, w, w];
    w_in: [c, n, d]; w_o1: [n, d, o].
    """
    b, h, w, c = u.shape
    n_px = h * w
    u_cm = jnp.transpose(u, (0, 3, 1, 2))          # [b, c, h, w] (one pass)
    kx = k_x.astype(u.dtype)
    ky = k_y.astype(u.dtype)

    g, s = fab_gram_stats(u_cm, kx, ky, variant=variant, block_b=block_b,
                          interpret=interpret)

    # IN statistics of phi = bb @ W_in from the Gram matrix (exact;
    # FABlock2D._gram_core math, factorized_attention.py:377-406)
    mean_c = s[:, :, 0, :] / n_px                   # [b, n, c]
    wf = w_in.astype(jnp.float32)                   # [c, n, d]
    mean = jnp.einsum("bnc,cnd->bnd", mean_c, wf)   # [b, n, d]
    ex2 = jnp.einsum("cnd,bnce,end->bnd", wf, g / n_px, wf)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                  # [b, n, d]
    w1f = w_o1.astype(jnp.float32)                  # [n, d, o]
    m = jnp.einsum("cnd,bnd,ndo->bnco", wf, inv, w1f).astype(u.dtype)
    bias = jnp.einsum("bnd,ndo->bo", mean * inv, w1f).astype(u.dtype)

    out = fab_apply_proj(u_cm, kx, ky, m, bias[:, None, :],
                         variant=variant, block_b=block_b,
                         interpret=interpret)
    if variant != "a4":
        out = jnp.swapaxes(out, 1, 2)               # [b, w, h, o] -> b h w o
    return out
