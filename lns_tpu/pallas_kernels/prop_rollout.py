"""Fused latent-rollout Pallas kernel: the WHOLE autoregressive propagator
scan in one pallas_call.

Why: the inference rollout's `lax.scan` over SimpleCNN steps is
kernel-count-bound, not bandwidth-bound — each step is ~35 tiny XLA kernels
on a <=12x24 latent grid (measured ~82 us/step on NS2d where the pure
byte/FLOP bound is ~15 us), so 29..78 sequential steps cost 2.4..8 ms of
fixed per-kernel overhead. Here the scan body is ONE Mosaic program:

  grid = (steps,); the latent carry lives in a VMEM scratch that persists
  across grid iterations (the TPU grid is sequential), weights are
  constant-index blocks (DMA'd into VMEM once, revolving buffers never
  rotate), and each step writes its [B, H, W, C_lat] output block to a
  step-indexed output ref.

The 3x3 (optionally dilated) convs become 9 shift+matmul taps:
  out = sum_{ky,kx} roll(x, -(ky-1)d, -(kx-1)d) [* mask] @ W[ky,kx]
with the roll on the VPU (VMEM-resident, ~0.5 MB) and each tap a
[B*H*W, C] @ [C, C] full-tile MXU matmul. Boundary handling is a
precomputed multiplicative mask per tap: circular = no mask, zeros = both
axes masked, half-periodic = the aperiodic axis masked — exactly the
padding semantics of lns_tpu.ops.conv.ConvND (reference propagators:
train_stage2_ns2d.py:25-87 circular, train_stage2_SW.py:31-43
half-periodic-x, train_stage2_twophase.py:32-43 zeros).

GroupNorm statistics accumulate in f32; GN(32)'s per-group moments use the
reshape-free channel->group 0/1-matmul mixing trick (see
pallas_kernels/group_norm.py) because a [*, G, C/G] lane-split reshape is
not Mosaic-legal.

Inference-only (no custom VJP): `LatentDynamics.predict_latents` can use it
for the forward rollout; training BPTT keeps the XLA scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUPPORTED_PAD = ("circular", "zeros", "half_periodic_x", "half_periodic_y")


def _erf_f32(x):
    """f32 erf via XLA's own rational approximation (ErfImpl32: max rel
    error 2^-28 on the clamped [-4, 4] domain, where erf is saturated to
    +-1 within f32 rounding anyway). Needed because neither `erf` nor
    `erfc` has a Mosaic lowering on this stack."""
    alpha = (0.00022905065861350646, 0.0034082910107109506,
             0.050955695062380861, 0.18520832239976145, 1.128379143519084)
    beta = (-1.1791602954361697e-07, 2.3547966471313185e-05,
            0.0010179625278914885, 0.014070470171167667,
            0.11098505178285362, 0.49746925110067538, 1.0)
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = np.float32(alpha[0])
    for c in alpha[1:]:
        p = p * x2 + np.float32(c)
    q = np.float32(beta[0])
    for c in beta[1:]:
        q = q * x2 + np.float32(c)
    return x * p / q


def _gelu(x):
    # exact (erf) formulation — matches ops/activations.gelu / torch GELU
    # to f32 rounding (see _erf_f32).
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + _erf_f32(xf * np.float32(0.7071067811865476)))
    return out.astype(x.dtype)


def _tap_masks(h: int, w: int, dilation: int, padding_mode: str):
    """[3, 3, h, w] f32 validity masks for the 9 conv taps (1 = the rolled
    value is a real neighbor, 0 = it wrapped across a zero-padded edge)."""
    masks = np.ones((3, 3, h, w), np.float32)
    wrap_y = padding_mode in ("circular", "half_periodic_y")
    wrap_x = padding_mode in ("circular", "half_periodic_x")
    iy = np.arange(h)[:, None]
    ix = np.arange(w)[None, :]
    for ky in range(3):
        for kx in range(3):
            oy, ox = (ky - 1) * dilation, (kx - 1) * dilation
            m = np.ones((h, w), np.float32)
            if not wrap_y:
                m *= ((iy + oy >= 0) & (iy + oy < h)).astype(np.float32)
            if not wrap_x:
                m *= ((ix + ox >= 0) & (ix + ox < w)).astype(np.float32)
            masks[ky, kx] = m
    return masks


def _need_mask(padding_mode: str):
    wrap_y = padding_mode in ("circular", "half_periodic_y")
    wrap_x = padding_mode in ("circular", "half_periodic_x")
    return tuple(
        tuple(bool((not wrap_y and ky != 1) or (not wrap_x and kx != 1))
              for kx in range(3))
        for ky in range(3)
    )


def _conv3x3(x4, w_taps, bias, masks, dil_y, dil_x, need_mask):
    """x4: [B, H, W, C] values; w_taps: [3, 3, C, C]; masks: [3, 3, H, W].
    Returns the padded 3x3 conv with f32 accumulation, cast back + bias
    (matching ConvND's conv -> astype(dtype) -> +bias order)."""
    b, h, w, c = x4.shape
    acc = None
    for ky in range(3):
        for kx in range(3):
            oy, ox = (ky - 1) * dil_y, (kx - 1) * dil_x
            r = x4
            if oy:
                r = jnp.roll(r, -oy, axis=1)
            if ox:
                r = jnp.roll(r, -ox, axis=2)
            if need_mask[ky][kx]:
                r = r * masks[ky, kx][None, :, :, None].astype(r.dtype)
            t = jax.lax.dot_general(
                r.reshape(b * h * w, c),
                w_taps[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    out = acc.astype(x4.dtype).reshape(b, h, w, c)
    return out + bias.reshape(1, 1, 1, -1).astype(x4.dtype)


def _gn1(x4, scale, bias, eps=1e-5):
    """GroupNorm(1) on [B, H, W, C]: per-sample stats over (H, W, C).
    scale/bias are [1, C] rows (Mosaic wants >=2-D operands)."""
    n = x4.shape[1] * x4.shape[2] * x4.shape[3]
    xf = x4.astype(jnp.float32)
    # two-stage reduction: a single multi-axis reduce to [b,1,1,1] trips a
    # Mosaic layout-inference check (arr.size() >= layout_rank) on this stack
    s1 = jnp.sum(jnp.sum(xf, axis=(1, 2), keepdims=True),
                 axis=3, keepdims=True)
    s2 = jnp.sum(jnp.sum(xf * xf, axis=(1, 2), keepdims=True),
                 axis=3, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    out = (xf - mean) * inv
    out = out * scale.reshape(1, 1, 1, -1).astype(jnp.float32) \
        + bias.reshape(1, 1, 1, -1).astype(jnp.float32)
    return out.astype(x4.dtype)


def _gn_grouped(x4, scale, bias, mix, eps=1e-6):
    """GroupNorm(G) via channel-moment mixing: mix is the [C, G] 0/1 group
    membership; per-(b, g) moments = per-channel moments @ mix."""
    b, h, w, c = x4.shape
    xf = x4.astype(jnp.float32).reshape(b, h * w, c)
    s1 = jnp.sum(xf, axis=1)            # [B, C]
    s2 = jnp.sum(xf * xf, axis=1)       # [B, C]
    mixf = mix.astype(jnp.float32)
    cg = c // mix.shape[1]
    denom = h * w * cg
    hi = jax.lax.Precision.HIGHEST
    g1 = jax.lax.dot_general(s1, mixf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hi) / denom
    g2 = jax.lax.dot_general(s2, mixf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hi) / denom
    var = jnp.maximum(g2 - g1 * g1, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jax.lax.dot_general(g1, mixf.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hi)
    inv_c = jax.lax.dot_general(inv, mixf.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hi)
    out = (xf.reshape(b, h, w, c) - mean_c[:, None, None, :]) \
        * inv_c[:, None, None, :]
    out = out * scale.reshape(1, 1, 1, -1).astype(jnp.float32) \
        + bias.reshape(1, 1, 1, -1).astype(jnp.float32)
    return out.astype(x4.dtype)


def _matmul(x4, w):
    b, h, wd, c = x4.shape
    out = jax.lax.dot_general(
        x4.reshape(b * h * wd, c), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x4.dtype).reshape(b, h, wd, w.shape[1])


def _rollout_kernel(z0_ref, in_w, in_b, gn_s, gn_b, conv_w, conv_b,
                    ffn_w, out_gn_s, out_gn_b, out_w, out_b, mask_ref,
                    mix_ref, o_ref, carry_ref, *, n_block: int,
                    dilation: int, need_mask):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[...] = z0_ref[...]

    z = carry_ref[...]                                   # [B, H, W, C_lat]
    h = _matmul(z, in_w[...]) \
        + in_b[...].reshape(1, 1, 1, -1).astype(z.dtype)
    m1 = mask_ref[0]        # dilation-1 tap masks
    md = mask_ref[1]        # dilation-d tap masks
    no_mask = ((False,) * 3,) * 3
    nm = need_mask
    nm1 = nm if any(any(r) for r in nm) else no_mask
    for i in range(n_block):
        # dilated residual block: GN1 -> conv3 -> gelu -> dilated conv3
        # -> gelu -> conv3, residual; then GN1 -> 1x1 -> gelu -> 1x1 FFN
        t = _gn1(h, gn_s[i, 0], gn_b[i, 0])
        t = _conv3x3(t, conv_w[i, 0], conv_b[i, 0], m1, 1, 1, nm1)
        t = _gelu(t)
        t = _conv3x3(t, conv_w[i, 1], conv_b[i, 1], md, dilation, dilation, nm)
        t = _gelu(t)
        t = _conv3x3(t, conv_w[i, 2], conv_b[i, 2], m1, 1, 1, nm1)
        h = h + t
        f = _gn1(h, gn_s[i, 1], gn_b[i, 1])
        f = _matmul(f, ffn_w[i, 0])
        f = _gelu(f)
        f = _matmul(f, ffn_w[i, 1])
        h = h + f
    h = _gn_grouped(h, out_gn_s[...], out_gn_b[...], mix_ref[...], eps=1e-6)
    z_new = _matmul(h, out_w[...]) \
        + out_b[...].reshape(1, 1, 1, -1).astype(h.dtype)
    carry_ref[...] = z_new
    o_ref[0] = z_new


def _conv_leaf(p):
    # HalfPeriodicConv2d wraps its ConvND under a "conv" submodule
    return p["conv"] if "kernel" not in p else p


def pack_simple_cnn_params(params, n_block: int, dtype=jnp.bfloat16):
    """Pack a SimpleCNN flax param tree (lns_tpu.models.propagator) into the
    stacked operand arrays the kernel consumes. Conv kernels stay HWIO —
    [3, 3, C, C] indexes directly as per-tap [C, C] matrices. Per-channel
    vectors are packed with a trailing unit row dim ([.., 1, C]): Mosaic's
    layout inference rejects rank-1 operands.

    The latent channel dim is zero-padded to a full 128-lane width: Mosaic's
    leading-dim collapse reshape ([b,h,w,c] -> [b*h*w,c]) rejects sub-128
    lane dims at some shapes, and zero rows/cols in the in/out projections
    keep the math exact (padded lanes of the carry stay identically 0)."""
    in_w = params["in_proj"]["kernel"].astype(dtype)
    c_lat = in_w.shape[0]
    cpad = -(-c_lat // 128) * 128 - c_lat
    if cpad:
        in_w = jnp.pad(in_w, ((0, cpad), (0, 0)))
    in_b = params["in_proj"]["bias"].astype(jnp.float32).reshape(1, -1)
    gn_s, gn_b, conv_w, conv_b, ffn_w = [], [], [], [], []
    for i in range(n_block):
        blk = params[f"net{i}"]
        cv = [_conv_leaf(blk[f"conv{j}"]) for j in (1, 2, 3)]
        gn_s.append(jnp.stack([blk["conv_gn"]["scale"], blk["ffn_gn"]["scale"]]))
        gn_b.append(jnp.stack([blk["conv_gn"]["bias"], blk["ffn_gn"]["bias"]]))
        conv_w.append(jnp.stack([c["kernel"] for c in cv]))
        conv_b.append(jnp.stack([c["bias"] for c in cv]))
        ffn_w.append(jnp.stack([blk["ffn_fc1"]["kernel"], blk["ffn_fc2"]["kernel"]]))
    c = in_w.shape[1]
    return (
        in_w, in_b,
        jnp.stack(gn_s).astype(jnp.float32).reshape(n_block, 2, 1, c),
        jnp.stack(gn_b).astype(jnp.float32).reshape(n_block, 2, 1, c),
        jnp.stack(conv_w).astype(dtype),        # [nb, 3, 3, 3, C, C]
        jnp.stack(conv_b).astype(jnp.float32).reshape(n_block, 3, 1, c),
        jnp.stack(ffn_w).astype(dtype),         # [nb, 2, C, C]
        params["out_gn"]["scale"].astype(jnp.float32).reshape(1, -1),
        params["out_gn"]["bias"].astype(jnp.float32).reshape(1, -1),
        jnp.pad(params["out_proj"]["kernel"].astype(dtype),
                ((0, 0), (0, cpad))),
        jnp.pad(params["out_proj"]["bias"].astype(jnp.float32).reshape(1, -1),
                ((0, 0), (0, cpad))),
    )


def supported(padding_mode: str, conditional: bool) -> bool:
    return (not conditional) and padding_mode in _SUPPORTED_PAD


@functools.partial(
    jax.jit,
    static_argnames=("steps", "n_block", "dilation", "padding_mode",
                     "groups", "interpret"),
)
def fused_rollout(z0, packed, steps: int, n_block: int, dilation: int,
                  padding_mode: str, groups: int = 32,
                  interpret: bool = False):
    """Run `steps` SimpleCNN propagator applications as one pallas_call.

    z0: [B, H, W, C_lat]; packed: pack_simple_cnn_params output.
    Returns [steps, B, H, W, C_lat] (step-major, like the XLA scan's ys).
    """
    (in_w, in_b, gn_s, gn_b, conv_w, conv_b, ffn_w,
     out_gn_s, out_gn_b, out_w, out_b) = packed
    b, h, w, c_lat = z0.shape
    c = in_w.shape[1]
    cp = in_w.shape[0]          # 128-lane-padded latent width (see pack)
    dtype = in_w.dtype
    z0 = z0.astype(dtype)
    if cp != c_lat:
        z0 = jnp.pad(z0, ((0, 0),) * 3 + ((0, cp - c_lat),))

    # [2, 3, 3, H, W]: dilation-1 masks for the undilated taps, dilation-d
    # for the middle conv (identical when d == 1)
    mask_op = jnp.asarray(np.stack([
        _tap_masks(h, w, 1, padding_mode),
        _tap_masks(h, w, dilation, padding_mode),
    ]))
    mix = np.zeros((c, groups), np.float32)
    cg = c // groups
    for ch in range(c):
        mix[ch, ch // cg] = 1.0
    mix = jnp.asarray(mix)

    def c_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _rollout_kernel, n_block=n_block, dilation=dilation,
        need_mask=_need_mask(padding_mode),
    )
    operands = (z0, in_w, in_b, gn_s, gn_b, conv_w, conv_b, ffn_w,
                out_gn_s, out_gn_b, out_w, out_b, mask_op, mix)

    zs = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[c_spec(a) for a in operands],
        out_specs=pl.BlockSpec((1, b, h, w, cp),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, b, h, w, cp), dtype),
        scratch_shapes=[pltpu.VMEM((b, h, w, cp), dtype)],
        interpret=interpret,
    )(*operands)
    return zs[..., :c_lat] if cp != c_lat else zs
