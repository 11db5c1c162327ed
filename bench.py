"""Benchmark: NS2d autoregressive rollout throughput (frames/sec/chip).

Measures the headline inference kernel — the fused encode -> 29 latent
steps -> batched decode rollout of the NS2d latent surrogate at the
reference's shipped shapes (64x64x1 field, 8x8x16 latent, SimpleCNN
propagator 3x128, batch 32, 29-step rollout = configs/ns2d_stage2_prop.yml
case_len 30, interval 1) — as a single jitted program on one chip.

Timing protocol: the axon tunnel adds ~30 ms host round-trip latency and
its block_until_ready does not block, so R rollouts are chained *inside*
one jitted fori_loop (data-dependent carry, no dead code) and the run time
of a 1-iteration call is subtracted from a (1+R)-iteration call (min of 3
each) — the difference cancels host RTT exactly.

Baseline: the reference implementation decodes inside a Python loop on an
A100 (estimated ~5,000 frames/s at batch 32; BASELINE.md "A100 estimate").
vs_baseline = measured / 5000.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline",
"sensitivity_band"}; the human-readable sensitivity note goes to stderr.
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: repeated driver runs skip the ~3-5 min
# remote compile of the fused rollout
os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np

A100_TORCH_BASELINE_FPS = 5000.0  # estimated reference throughput (BASELINE.md)

BATCH = int(__import__("os").environ.get("LNS_BENCH_BATCH", "32"))
STEPS = 29
REPS = 20
# Decode the (batch*steps) frames in ~116-frame chunks (lax.map): measured
# optimum on v5e — the NS2d decode scales inversely past ~464 frames
# (BASELINE.md "Single-chip batch scaling"); chunk sweep: none 17.5k /
# 464 19.7k / 232 21.1k / 116 21.9k / 58 20.9k frames/s. 0 disables.
DECODE_CHUNK = int(__import__("os").environ.get("LNS_BENCH_DECODE_CHUNK", "116")) or None


def build():
    import importlib.util
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(here, "__graft_entry__.py")
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from lns_tpu.models import LatentDynamics

    cfg = graft._ns2d_cfg()
    model = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x.shape)
    params = variables["params"]

    @jax.jit
    def rollout_chain(params, x, n):
        """n back-to-back rollouts with a data-dependent carry so none can
        be optimized away; returns a scalar to fetch."""

        def body(i, carry):
            y = model.predict(params, carry, steps=STEPS, to_x=True,
                              decode_chunk=DECODE_CHUNK)
            # feed the last predicted frame back (scaled) — real dependency
            return carry + 1e-6 * y[:, -1]

        out = jax.lax.fori_loop(0, n, body, x)
        return out[0, 0, 0, 0]

    return rollout_chain, params, x


def main():
    rollout_chain, params, x = build()
    np.asarray(rollout_chain(params, x, 1))  # compile + warmup

    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rollout_chain(params, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    # difference method cancels the host round-trip entirely
    t1 = timed(1)
    tn = timed(1 + REPS)
    per_rollout = (tn - t1) / REPS

    fps = BATCH * STEPS / per_rollout
    # sensitivity band for the analytic A100 denominator (BASELINE.md
    # "Sensitivity of the 5,000 f/s denominator"): 10-25% A100 utilization
    # -> 3.3k-8k f/s. Goes to stderr so stdout stays ONE parseable JSON line.
    print(f"# A100-denominator sensitivity: vs_baseline spans "
          f"{fps / 8000.0:.2f}x (25% util, 8k f/s) .. "
          f"{fps / 3300.0:.2f}x (10% util, 3.3k f/s); "
          f"headline uses 5k f/s", file=sys.stderr)
    print(json.dumps({
        "metric": "ns2d_rollout_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_TORCH_BASELINE_FPS, 2),
        "sensitivity_band": [round(fps / 8000.0, 2), round(fps / 3300.0, 2)],
    }))


if __name__ == "__main__":
    main()
