"""XLA TPU flag sweep over the FAB core (VERDICT round 2 item 1b).

Round-3 finding: XLA_FLAGS cannot carry --xla_tpu_* options on this stack —
compilation is REMOTE (axon tunnel) and the local jaxlib's flag parser
aborts on TPU-only flag names before any request is sent. The working
channel is PJRT `compiler_options` on the compile call, which the remote
compile server validates (bogus names raise) and applies. This sweep
compiles the probe formulation once per config with those options and
times it with the chained difference protocol.

    python benchmarks/probe_xla_flags.py [--shape 928,32,32,64]
        [--variant blkG] [--configs ...]

Writes benchmarks/results_xla_flags.json.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "default": {},
    "scoped_vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "copy_elision_10x": {"xla_tpu_copy_elision_analysis_allowance": "300000"},
    "licm": {"xla_tpu_enable_while_loop_invariant_code_motion": "true"},
    "no_multilevel_fusion": {"xla_tpu_use_multilevel_fusion": "false"},
    "no_bloat_fusion": {"xla_tpu_enable_bloat_fusion": "false"},
    "async_copies_off": {"xla_tpu_enable_async_collective_fusion": "false"},
    "dot_merger_off": {"xla_tpu_enable_dot_merger": "false"},
}


def timed(compiled, args, n=16):
    """Chained difference protocol on a pre-compiled executable."""
    def run():
        return np.asarray(compiled(*args)[0, 0, 0, 0])

    run()
    best1 = bestn = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(1 + n):
            out = compiled(*args)
        np.asarray(out[0, 0, 0, 0])
        bestn = min(bestn, time.perf_counter() - t0)
    return (bestn - best1) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="928,32,32,64")
    ap.add_argument("--variant", default="blkG")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    args = ap.parse_args()

    from benchmarks import probe_fab_block as pb

    b, h, w, c = (int(v) for v in args.shape.split(","))
    heads, d = 8, 64
    ks = jax.random.split(jax.random.key(0), 6)
    dt = jnp.bfloat16
    u = jax.random.normal(ks[0], (b, h, w, c)).astype(dt)
    kx = (jax.random.normal(ks[1], (b, heads, h, h)) / h).astype(dt)
    ky = (jax.random.normal(ks[2], (b, heads, w, w)) / w).astype(dt)
    w_in = (jax.random.normal(ks[3], (c, heads, d)) / c**0.5).astype(dt)
    w_o1 = (jax.random.normal(ks[4], (heads, d, c)) / (heads * d) ** 0.5).astype(dt)
    w_o2 = (jax.random.normal(ks[5], (c, c)) / c**0.5).astype(dt)
    fargs = (u, kx, ky, w_in, w_o1, w_o2)

    fn = getattr(pb, args.variant)
    lowered = jax.jit(fn).lower(*fargs)
    print(f"devices: {jax.devices()}", flush=True)

    results = {}
    for name in args.configs.split(","):
        opts = CONFIGS[name]
        t0 = time.time()
        try:
            compiled = lowered.compile(compiler_options=opts) if opts else lowered.compile()
            t_ms = timed(compiled, fargs) * 1e3
            rec = {"options": opts, "ms": round(t_ms, 2),
                   "compile_s": round(time.time() - t0, 1)}
        except Exception as e:  # unknown flag -> server-side reject
            rec = {"options": opts, "error": repr(e)[:300]}
        results[name] = rec
        print(f"[{time.strftime('%H:%M:%S')}] {name}: "
              f"{rec.get('ms', rec.get('error', '?'))}", flush=True)
        with open(os.path.join(HERE, "results_xla_flags.json"), "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
