"""Per-segment timing of the NS2d benchmark decode (928 frames, bf16).

Times cumulative prefixes of the decoder layer stack with the chained
fori_loop difference protocol (utils/profiling.py rationale: the axon
tunnel's block_until_ready doesn't block, so RTT must cancel), then prints
the per-segment deltas. Segments group the decoder spec into its logical
stages so compile count stays small.

Usage: python benchmarks/profile_decode.py [--batch 928] [--f32]
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

from __graft_entry__ import _ns2d_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=928)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from lns_tpu.models.autoencoder import SimpleAutoencoder
    from lns_tpu.models.specs import decoder_spec

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = _ns2d_cfg()
    ae = SimpleAutoencoder(cfg, dtype=dtype)
    z = jax.random.normal(jax.random.PRNGKey(0), (args.batch, 8, 8, 16), jnp.float32)
    variables = ae.init(jax.random.PRNGKey(1), jnp.zeros((2, 64, 64, 1)))
    params = variables["params"]

    specs = list(decoder_spec(cfg))
    names = [s.name for s in specs]
    # segment boundaries: index AFTER which we cut (prefix includes spec[:k])
    segments = [
        ("post_quant+8x8 (m0-m5 incl SA)", 6),
        ("up->16 + res (m6-m7)", 8),
        ("FAB@16 (m8)", 9),
        ("up->32 + res (m9-m10)", 11),
        ("FAB@32 (m11)", 12),
        ("resize->64 + conv3x3 (m12-m13)", 14),
        ("tail 1x1+GN+swish+1x1 (m14-m17)", len(specs)),
    ]

    def prefix_fn(k):
        """decode through post_quant_conv + first k decoder layers; returns a
        scalar folded back into the carry for a real data dependency."""

        def fn(carry):
            h = ae.apply({"params": params}, carry,
                         method=lambda m, zz: m.post_quant_conv(zz))
            # run first k decoder layers via a trimmed apply
            def run(m, x):
                x = m.post_quant_conv(x)
                dec = m.decoder
                for spec in specs[:k]:
                    if spec.kind == "swish":
                        from lns_tpu.ops.activations import swish
                        x = swish(x)
                    elif spec.kind == "resize":
                        from lns_tpu.ops.sampling import resize_nearest_torch
                        x = resize_nearest_torch(x, spec.kw["out_h"], spec.kw["out_w"])
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
    print(f"batch={args.batch} dtype={dtype.__name__}")
    for label, k in segments:
        t = timed(prefix_fn(k), args.reps)
        print(f"  cum[:{k:2d}] {t*1e3:8.2f} ms | +{(t-prev)*1e3:7.2f} ms  {label}")
        prev = t
        total = t
    print(f"decode total ~ {total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
