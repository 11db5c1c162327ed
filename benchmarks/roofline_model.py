"""Analytic per-op roofline for the decode, with MXU-starvation terms.

The HLO bytes ledger (roofline_decode.py) charges every op its HBM bytes
at the measured elementwise bandwidth — a hard lower bound for the
compiled graph, but optimistic for the factorized-attention batched dots:
each (batch, head) element of the axial applies is an M=K=32 matmul, so
the MXU runs at (M/128)*(K/128) = 1/16 array utilization and those ops are
*compute*-bound at the starved rate, not bandwidth-bound (xplane profile:
row/col dots measure ~2.2x their bandwidth floor).

This module rebuilds the decode op-by-op from the architecture (shapes,
dtypes, formulation — no HLO parsing) and charges each op

    t_op = max(bytes / BW_EFF, flops / (PEAK * util_M * util_K))

with util_X = min(X, 128)/128 for dot dimensions (1.0 for elementwise).
This is still a lower bound per op (perfect overlap of the memory and MXU
pipelines, no kernel launch or DMA-setup costs, which at 7.4k tiny batched
matmuls per axial apply are real), so measured-vs-bound gaps quantify
scheduling slack honestly.

    python benchmarks/roofline_model.py

Prints per-workload tables and writes benchmarks/results_roofline_model.json.
Reference kernel being bounded: /root/reference/train_stage2_ns2d.py:143-158
(decode inside the rollout loop).
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

BW = 671e9        # measured XLA elementwise r+w bytes/s (probe_pallas_bw.py)
PEAK = 191e12     # measured sustained bf16 matmul FLOP/s (bench.py calibration)


def _util(m, k):
    return (min(m, 128) / 128.0) * (min(k, 128) / 128.0)


class Ledger:
    def __init__(self, label):
        self.label = label
        self.rows = []

    def op(self, name, read_bytes, write_bytes, flops=0, m=128, k=128):
        b = read_bytes + write_bytes
        t_bw = b / BW
        t_mx = flops / (PEAK * _util(m, k)) if flops else 0.0
        self.rows.append({
            "op": name, "gb": round(b / 1e9, 3),
            "gflops": round(flops / 1e9, 1),
            "t_bw_ms": round(t_bw * 1e3, 3), "t_mxu_ms": round(t_mx * 1e3, 3),
            "t_ms": round(max(t_bw, t_mx) * 1e3, 3),
            "bound": "mxu" if t_mx > t_bw else "bw",
        })

    def total(self):
        return round(sum(r["t_ms"] for r in self.rows), 2)

    def report(self):
        print(f"== {self.label}: bound {self.total()} ms")
        for r in sorted(self.rows, key=lambda r: -r["t_ms"])[:14]:
            print(f"  {r['t_ms']:7.3f} ms [{r['bound']}] {r['gb']:6.2f} GB "
                  f"{r['gflops']:8.1f} GF  {r['op']}")
        return {"label": self.label, "bound_ms": self.total(),
                "rows": self.rows}


def fab_batched(L, tag, b, h, w, c, heads=8, d=64, dt=2):
    """FABlock2D _batched_core ops at [b, h, w, c] (bf16 activations).

    Charges only the full-size-tensor ops; the pooled-descriptor path
    (PoolingReducer/LowRankKernel on [b, n, ...] with n <= 96) is <1% of
    bytes and FLOPs and is folded into 'small' at the end.
    """
    hw = h * w
    u = b * hw * c * dt
    phi = b * hw * heads * d * dt
    # GroupNorm(1) on u: stats read + normalize read/write (fused epilogue)
    L.op(f"{tag}.gn1", 2 * u, u)
    # to_in Conv1x1 (pooling path input): read u, write u
    L.op(f"{tag}.to_in", u, u, flops=2 * b * hw * c * c, m=c, k=c)
    # in_proj dot: read u, write phi
    L.op(f"{tag}.in_proj", u, phi, flops=2 * b * hw * c * heads * d,
         m=hw, k=c)
    # 5D relayout copy (measured: XLA bridges elementwise->dot layouts
    # with one full copy of phi; every formulation that removes it pays
    # more elsewhere — see DESIGN.md item 5)
    L.op(f"{tag}.relayout", phi, phi)
    # row apply: batched dot (b*heads batches of [h,h]@[h,w*d])
    L.op(f"{tag}.row", phi + b * heads * h * h * dt, phi,
         flops=2 * b * heads * h * h * w * d, m=h, k=h)
    # col apply (+ fused read-only IN stats epilogue)
    L.op(f"{tag}.col+stats", phi + b * heads * w * w * dt, phi,
         flops=2 * b * heads * w * w * h * d, m=w, k=w)
    # out projection: contract (heads, d), write o=c
    L.op(f"{tag}.out_proj", phi, u, flops=2 * b * hw * heads * d * c,
         m=hw, k=heads * d)
    # gelu + out_fc2 + residual on the small tensor
    L.op(f"{tag}.fc2+res", 2 * u, u, flops=2 * b * hw * c * c, m=c, k=c)


def upconv2x(L, tag, b, h, w, cin, cout, dt=2):
    """nearest-2x + conv3x3 fused as one lhs-dilated conv (round-3 product
    lowering, ConvND.upsample_2x): reads the SMALL grid, writes the big
    one, 4 effective taps per output pixel (the dilated input's structural
    zeros)."""
    L.op(f"{tag}.upconv",
         b * h * w * cin * dt + 16 * cin * cout * dt,
         b * 4 * h * w * cout * dt,
         flops=2 * b * 4 * h * w * 4 * cin * cout,
         m=h * w, k=4 * cin)


def conv3x3(L, tag, b, h, w, cin, cout, dt=2):
    L.op(tag, b * h * w * cin * dt + 9 * cin * cout * dt,
         b * h * w * cout * dt, flops=2 * b * h * w * 9 * cin * cout,
         m=h * w, k=9 * cin)


def resblock(L, tag, b, h, w, cin, cout, dt=2):
    # GN -> swish -> conv3x3 -> GN -> swish -> conv3x3 (+ 1x1 skip if c changes)
    u_in = b * h * w * cin * dt
    L.op(f"{tag}.gn1+swish", 2 * u_in, u_in)
    conv3x3(L, f"{tag}.conv1", b, h, w, cin, cout, dt)
    u_out = b * h * w * cout * dt
    L.op(f"{tag}.gn2+swish", 2 * u_out, u_out)
    conv3x3(L, f"{tag}.conv2", b, h, w, cout, cout, dt)
    if cin != cout:
        L.op(f"{tag}.skip1x1", u_in, u_out, flops=2 * b * h * w * cin * cout,
             m=h * w, k=cin)
    L.op(f"{tag}.res_add", 2 * u_out, u_out)


def ns2d_decode(b=928):
    """NS2d decoder at bench scale: latent [b,8,8,16] -> [b,64,64,1].

    Mirrors models/specs.py decoder_spec for the ns2d config: conv128 @8,
    3 res + SA @8, up->16, res, FAB @16 (c=64 after res128->64? — the
    shipped config keeps c=128 at 16 and 64 at 32; shapes below follow
    the traced decode HLO), up->32, res, FAB @32, resize->64, convs, GN,
    head conv.
    """
    L = Ledger(f"ns2d_decode[b={b}]")
    # latent-level (8x8, c=128): post_quant 1x1 + conv128 + 4 resblocks +
    # SA over 64 tokens — tiny spatial, modeled as one aggregate op
    z = b * 64 * 16 * 2
    L.op("latent_level(8x8)", 14 * z * 8, 14 * z * 8,
         flops=2 * b * 64 * (16 * 128 + 8 * 9 * 128 * 128 + 4 * 128 * 128),
         m=64, k=128)
    # up 8->16 (fused nearest-2x + conv, see upconv2x)
    upconv2x(L, "up16", b, 8, 8, 128, 128)
    resblock(L, "res16", b, 16, 16, 128, 64)
    fab_batched(L, "fab16", b, 16, 16, 64)
    # up 16->32 at c=64
    upconv2x(L, "up32", b, 16, 16, 64, 64)
    resblock(L, "res32", b, 32, 32, 64, 64)
    fab_batched(L, "fab32", b, 32, 32, 64)
    # resize 32->64 + head conv1, fused (exact nearest doubling)
    upconv2x(L, "head.conv1", b, 32, 32, 64, 64)
    u = b * 4096 * 64 * 2
    L.op("head.conv2_1x1", 2 * u, u, flops=2 * b * 4096 * 64 * 64,
         m=4096, k=64)
    L.op("head.gn+swish", 2 * u, u)
    L.op("head.out_1x1", u, b * 4096 * 1 * 2, flops=2 * b * 4096 * 64,
         m=4096, k=64)
    return L


def sw_decode(b=336):
    """SW decoder: latent [b,12,24,64] -> [b,96,192,3] (half-periodic)."""
    L = Ledger(f"sw_decode[b={b}]")
    # latent level (12x24 tokens, c=128): hp_conv + SA(360) + 3 hp_res
    zc = b * 288 * 128 * 2
    L.op("latent_level(12x24)", 12 * zc, 12 * zc,
         flops=2 * b * 288 * (64 * 128 + 7 * 9 * 128 * 128 + 4 * 128 * 128),
         m=288, k=128)
    upconv2x(L, "up24x48", b, 12, 24, 128, 128)
    resblock(L, "res24x48", b, 24, 48, 128, 64)
    fab_batched(L, "fab24x48", b, 24, 48, 64)
    upconv2x(L, "up48x96", b, 24, 48, 64, 64)
    resblock(L, "res48x96", b, 48, 96, 64, 64)
    fab_batched(L, "fab48x96", b, 48, 96, 64)
    # resize 48x96 -> 96x192 + head conv1, fused
    upconv2x(L, "head.conv1", b, 48, 96, 64, 64)
    conv3x3(L, "head.conv2", b, 96, 192, 64, 64)
    u = b * 96 * 192 * 64 * 2
    L.op("head.gn+swish", 2 * u, u)
    L.op("head.out_1x1", u, b * 96 * 192 * 3 * 2,
         flops=2 * b * 96 * 192 * 64 * 3, m=96 * 192, k=64)
    return L


def twophase_decode(b=624):
    """Two-phase decoder: latent [b,7,15,64] -> [b,61,121,4] (zeros pad).

    Mirrors models/specs.py decoder_spec_nonsquared for the shipped
    twophase_stage1_ae.yml. Per SURVEY section 2.10-8 the mid-decoder
    attention never fires (attn_resolutions [15,30] vs height trace
    7->7->14->28->61), so the hot path is pure conv/resblock: coarse SA at
    7x15 (105 tokens), 4 resblocks @128, up->14x30, res 128->64,
    up->28x60, res 64, exact-size nearest resize ->61x121, two conv3x3 @64,
    GN+swish, 1x1 head to 4 channels. No FAB blocks -> the composite floor
    equals this analytic bound (no measured-block substitution needed).
    """
    L = Ledger(f"twophase_decode[b={b}]")
    # latent level (7x15 = 105 tokens, c=128): conv stem 64->128 +
    # 4 resblocks + SA(105, heads 8, dim_head 64) — tiny spatial,
    # aggregated like the other workloads' latent levels
    zc = b * 105 * 128 * 2
    L.op("latent_level(7x15)", 14 * zc, 14 * zc,
         flops=2 * b * 105 * (9 * 64 * 128 + 8 * 9 * 128 * 128
                              + 4 * 128 * 128 + 105 * 8 * 64 * 2),
         m=105, k=128)
    upconv2x(L, "up14x30", b, 7, 15, 128, 128)
    resblock(L, "res14x30", b, 14, 30, 128, 64)
    upconv2x(L, "up28x60", b, 14, 30, 64, 64)
    resblock(L, "res28x60", b, 28, 60, 64, 64)
    # exact-size nearest resize 28x60 -> 61x121 (pure relayout traffic)
    L.op("resize61x121", b * 28 * 60 * 64 * 2, b * 61 * 121 * 64 * 2)
    conv3x3(L, "head.conv1", b, 61, 121, 64, 64)
    conv3x3(L, "head.conv2", b, 61, 121, 64, 64)
    u = b * 61 * 121 * 64 * 2
    L.op("head.gn+swish", 2 * u, u)
    L.op("head.out_1x1", u, b * 61 * 121 * 4 * 2,
         flops=2 * b * 61 * 121 * 64 * 4, m=61 * 121, k=64)
    return L


def main():
    out = {}
    for build in (ns2d_decode, sw_decode, twophase_decode):
        L = build()
        out[L.label] = L.report()
    with open(os.path.join(HERE, "results_roofline_model.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> results_roofline_model.json")


if __name__ == "__main__":
    main()
