"""Per-segment timing of a workload's benchmark decode (bf16 by default).

Times cumulative prefixes of the decoder layer stack with the chained
fori_loop difference protocol (utils/profiling.py rationale: the axon
tunnel's block_until_ready doesn't block, so RTT must cancel), then prints
the per-segment deltas. Segments group the decoder spec into its logical
stages so compile count stays small.

Usage: python benchmarks/profile_decode.py [--workload sw] [--batch N] [--f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="ns2d",
                    choices=["ns2d", "sw", "twophase"])
    ap.add_argument("--batch", type=int, default=None,
                    help="decode frames (default: the workload's benchmark "
                         "batch*steps: ns2d 928, sw 336, twophase 624)")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from benchmarks.run_benchmarks import WORKLOADS
    from lns_tpu.models.autoencoder import SimpleAutoencoder
    from lns_tpu.models.specs import decoder_spec

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg_fn, shape, steps, bench_batch = WORKLOADS[args.workload]
    cfg = cfg_fn()
    batch = args.batch or bench_batch * steps
    ae = SimpleAutoencoder(cfg, dtype=dtype)
    variables = ae.init(jax.random.PRNGKey(1), jnp.zeros((2,) + shape))
    params = variables["params"]
    # latent grid shape via eval_shape (twophase's 7x15 comes from the
    # asymmetric (0,1)-pad downsample arithmetic, not a resolution ratio)
    zshape = jax.eval_shape(
        lambda x: ae.apply(variables, x, method=SimpleAutoencoder.encode),
        jax.ShapeDtypeStruct((1,) + shape, jnp.float32)).shape
    z = jax.random.normal(jax.random.PRNGKey(0),
                          (batch,) + zshape[1:], jnp.float32)

    specs = list(decoder_spec(cfg))
    if args.workload == "ns2d":
        # hand-grouped segments (kept from the round-3 profiles)
        segments = [
            ("post_quant+8x8 (m0-m5 incl SA)", 6),
            ("up->16 + res (m6-m7)", 8),
            ("FAB@16 (m8)", 9),
            ("up->32 + res (m9-m10)", 11),
            ("FAB@32 (m11)", 12),
            ("resize->64 + conv3x3 (m12-m13)", 14),
            ("tail 1x1+GN+swish+1x1 (m14-m17)", len(specs)),
        ]
    else:
        # generic segments: cut after every attention / upsample / resize
        # boundary so each segment groups one resolution stage
        segments = []
        for k, s in enumerate(specs):
            if s.kind in ("fablock", "sablock", "hp_up", "up", "resize"):
                label = f"..m{k} thru {s.kind}"
                segments.append((label, k + 1))
        if not segments or segments[-1][1] != len(specs):
            segments.append(("tail", len(specs)))

    def prefix_fn(k):
        """decode through post_quant_conv + first k decoder layers; returns a
        scalar folded back into the carry for a real data dependency."""

        def fn(carry):
            # run post_quant_conv + first k decoder layers via a trimmed apply
            def run(m, x):
                x = m.post_quant_conv(x)
                dec = m.decoder
                for spec in specs[:k]:
                    if spec.kind == "swish":
                        from lns_tpu.ops.activations import swish
                        x = swish(x)
                    elif spec.kind == "resize":
                        if not spec.kw.get("fused"):
                            from lns_tpu.ops.sampling import resize_nearest_torch
                            x = resize_nearest_torch(
                                x, spec.kw["out_h"], spec.kw["out_w"])
                    else:
                        x = dec._layers[spec.name](x)
                return x
            y = ae.apply({"params": params}, carry, method=run)
            return carry + (1e-12 * jnp.sum(y)).astype(carry.dtype)

        return fn

    def timed(fn, n):
        chained = jax.jit(
            lambda c, k: jax.lax.fori_loop(0, k, lambda i, cc: fn(cc), c))
        np.asarray(chained(z, 1))  # compile+warmup
        def run(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(chained(z, k))
                best = min(best, time.perf_counter() - t0)
            return best
        t1 = run(1)
        tn = run(1 + n)
        return (tn - t1) / n

    prev = 0.0
    prev_k = 0
    total = None
    print(f"workload={args.workload} batch={batch} dtype={dtype.__name__}")
    for label, k in segments:
        t = timed(prefix_fn(k), args.reps)
        print(f"  cum[:{k:2d}] {t*1e3:8.2f} ms | +{(t-prev)*1e3:7.2f} ms  {label}")
        prev = t
        total = t
    print(f"decode total ~ {total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
