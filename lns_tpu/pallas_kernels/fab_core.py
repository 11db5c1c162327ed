"""Single-pass fused Pallas FAB core: apply-pair + InstanceNorm statistics
+ folded out-projection in ONE Mosaic program, with no HBM value tensor
(round 5; VERDICT r4 item 1).

The factorized-attention block's cost on this chip is the head-major value
tensor bb = K_x (K_y u) — 121 MB per 116-frame NS2d chunk, 15.9 GB per SW
rollout — which the XLA formulation (`FABlock2D._batched_gram_core`) must
write once and read twice (Gram statistics + out-projection), plus the
inter-apply relayout copy XLA re-inserts no matter how the einsums are
written (BASELINE.md round-4 attempts a-e). This kernel removes that tensor
from HBM entirely — and, unlike the round-5 two-pass stats+recompute
design it replaces (git 30394d2), it needs only ONE pass: each program
holds its samples' ENTIRE spatial field in VMEM, so the InstanceNorm
statistics of phi are local to the program and nothing has to round-trip
through XLA between passes. Per (sample-block, head):

    a    = u . k_y^T          [c,h,w].[l,w]   -> [c,h,l]
    bb   = k_x . a            [i,h].[c,h,l]   -> [i,c,l]     (c-space value)
    phi  = W_in^T .c bb       [d,c].[i,c,l]   -> [d,i,l]     (stats only)
    inv  = rsqrt(var(phi) + eps);  mean = mean(phi)            (per d)
    m^T  = (w1^T . diag(inv)) . W_in^T          -> [o,c]      (tiny 2D)
    out += m^T .c bb - bias                     -> [o,i,l]    (head-accum)

Per block the only big-tensor HBM traffic is u in (once per sample block —
the u block is grid-invariant across the head axis) and the [b,o,h,w] f32
projection out: ~45 MB/chunk for NS2d vs ~620 MB for the XLA core. This
also sidesteps the measured ~260 GB/s Pallas DMA ceiling on this stack
(DESIGN.md "Pallas on this stack"): there is almost nothing left to DMA.

STATUS (round-5 on-chip verdict): this kernel is correct (interpret-mode
golden tests below) but DOES NOT COMPILE on this stack's Mosaic, and the
on-chip probe campaign (benchmarks/probe_mosaic_dots.py) established that
no profitable variant can: the compiling op-class set is too thin to chain
two axial contractions and a channel contraction through VMEM. Measured
op-class map (each row one on-chip compile):
  - rank-3 lhs-minor x rank-2    ([c,h,w].[l,w] -> [c,h,l])          OK
  - rank-2 x rank-3 rhs-interior ([i,h].[c,h,l] -> [i,c,l])
    with an INPUT-ref rhs                                             OK
  - rank-3 lhs-interior x rank-2 ([i,c,l].[c,o] -> [i,l,o])
    with an INPUT-ref lhs (phi_moments / phi_f32out probes)           OK
  - 2D matmuls, elementwise, keepdim reduces, f32 rank-3 ref writes,
    leading-pair 3D transposes of scratch loads (axial_attention.py)  OK
  - rank-2 x rank-3 rhs-minor / rhs-major (minor-dim-splitting or
    minor-pair-collapsing tpu.reshape: "unsupported shape cast")      FAIL
  - batched rank-3 dots (same collapse on the batch operand)          FAIL
  - interior contraction on any DOT-PRODUCED or SCRATCH-LOADED
    rank-3 operand (only INPUT refs get layout freedom; a scratch
    ref's layout is pinned by its writer)                      FAIL/HANG
  - preferred_element_type=bf16 tpu.matmul                            FAIL
  - bf16-cast rank-3 ref write of a dot result (HANGS the remote
    compile service for ~10 min)                                      HANG
Consequence: after the first apply, the second apply's contraction axis is
interior on a non-input operand in every orientation, so the chain cannot
continue with big dots; the only escape is the round-2 axial_attention.py
pattern (leading-indexed loops of 2D dots), whose per-dot issue overhead
measured ~2x slower than the XLA core at these shapes (DESIGN.md
"Factorized attention" item 2). The XLA `_batched_gram_core` therefore
remains the production FAB core; this file stays as the validated record
of the design and of the op-class map that rules it out. Gate
`fab2p_enabled()` stays default-OFF.

Reference kernel this was aimed at: the decode-inside-the-loop rollout at
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


def _fused_kernel(u_ref, kx_ref, ky_ref, wi_ref, w1_ref, o_ref, acc_ref,
                  bb_ref, *, n_heads, n_px, eps, block_b):
    jn = pl.program_id(1)
    dt = u_ref.dtype
    wi = wi_ref[0]                                     # [c, d]
    w1 = w1_ref[0]                                     # [d, o]
    for p in range(block_b):
        # apply pair, c-space (the in_proj commutes past the axial kernels)
        a = _dg(u_ref[p], ky_ref[p, 0], ((2,), (1,)), dt)    # [c,h,l]
        # round-trip bb through a VMEM scratch: Mosaic can give a REF LOAD
        # whatever layout the interior-contraction consumers below need,
        # but a dot-produced rank-3 lhs forces an unsupported relayout
        # reshape (measured on-chip — probe_mosaic_dots.py apply_chain)
        bb_ref[...] = _dg(kx_ref[p, 0], a, ((1,), (1,)))     # [i,c,l] f32
        bb = bb_ref[...].astype(dt)
        # InstanceNorm statistics of phi = bb .c W_in, local to the program
        phi = _dg(bb, wi, ((1,), (0,)))                      # [i,l,d] f32
        s1 = jnp.sum(jnp.sum(phi, axis=1, keepdims=True),
                     axis=0, keepdims=True)                  # [1,1,d]
        s2 = jnp.sum(jnp.sum(phi * phi, axis=1, keepdims=True),
                     axis=0, keepdims=True)
        mean = s1[0] / n_px                                  # [1,d]
        var = jnp.maximum(s2[0] / n_px - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)                       # [1,d]
        # fold in_proj + IN + out_fc1 into one c->o matrix and a bias
        m = _dg(wi.astype(jnp.float32) * inv, w1, ((1,), (0,)), dt)  # [c,o]
        bias = _dg(mean * inv, w1, ((1,), (0,)))             # [1,o]
        t = _dg(bb, m, ((1,), (0,)))                         # [i,l,o] f32
        contrib = t - bias[None]

        @pl.when(jn == 0)
        def _():
            acc_ref[p] = contrib

        @pl.when(jn > 0)
        def _():
            acc_ref[p] += contrib

        @pl.when(jn == n_heads - 1)
        def _():
            o_ref[p] = acc_ref[p]


def _pick_block_b(b: int, default: int = 29) -> int:
    """Largest divisor of b that is <= default (amortizes per-program
    overhead without oversizing VMEM)."""
    bs = min(default, b)
    while b % bs:
        bs -= 1
    return bs


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_b", "interpret"))
def _fab_fused(u_cm, kx, ky, wi, w1, eps, block_b, interpret):
    b, c, h, w = u_cm.shape
    n = kx.shape[1]
    d = wi.shape[2]
    o = w1.shape[2]
    bs = block_b or _pick_block_b(b)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, n_heads=n, n_px=h * w, eps=eps,
                          block_b=bs),
        grid=(b // bs, n),
        in_specs=[
            pl.BlockSpec((bs, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1, h, h), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1, w, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, o), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, h, w, o), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bs, h, w, o), jnp.float32),
                        pltpu.VMEM((h, c, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(u_cm, kx, ky, wi, w1)
    return out


def fab_fused_core(u, k_x, k_y, w_in, w_o1, eps: float = 1e-5,
                   block_b: int = 0, interpret: bool = False):
    """Drop-in replacement for FABlock2D._batched_gram_core (same inputs,
    same [b, h, w, o] output, same math) with the head-major value tensor
    never leaving VMEM.

    u: [b, h, w, c] (post-GN); k_x: [b, n, h, h]; k_y: [b, n, w, w];
    w_in: [c, n, d]; w_o1: [n, d, o].
    """
    b, h, w, c = u.shape
    u_cm = jnp.transpose(u, (0, 3, 1, 2))          # [b, c, h, w] (one pass)
    kx = k_x.astype(u.dtype)
    ky = k_y.astype(u.dtype)
    wi = jnp.transpose(w_in, (1, 0, 2)).astype(u.dtype)    # [n, c, d]
    w1 = w_o1.astype(jnp.float32)                          # [n, d, o]
    out = _fab_fused(u_cm, kx, ky, wi, w1, eps, block_b, interpret)
    return out.astype(u.dtype)                             # [b,h,w,o]


# round-5 history: the first design here was a TWO-pass stats+recompute
# core (Gram statistics pass + apply pass, git 30394d2). On-chip it proved
# unbuildable — tpu.matmul rejects the multi-dim and batched contractions
# every Gram formulation needs (probe_mosaic_dots.py) — and the
# single-pass fused kernel above superseded it (fewer passes, no
# recompute) before hitting the interior-contraction wall documented in
# the module docstring.
