"""XLA TPU layout/scheduler flag sweep over the FAB@32x32 core (VERDICT
round 2 item 1b).

The NS2d decode's remaining 16 ms is XLA layout-assignment copies around
the factorized-attention dots; this sweeps the layout-related
`--xla_tpu_*` flags surfaced by libtpu (flag names extracted from
libtpu.so) against the blkA/blkD probe at the benchmark shape and records
per-flag timings. Each setting forces a fresh (remote, ~minutes) compile —
the sweep runs each config as a subprocess so XLA_FLAGS take effect.

    python benchmarks/probe_xla_flags.py [--shapes 928,32,32,64]
        [--variants blkA,blkD] [--configs default,autotune_layouts,...]

Writes benchmarks/results_xla_flags.json.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = {
    "default": "",
    "autotune_layouts": "--xla_tpu_autotune_layouts=true",
    "layout_negotiation": "--xla_tpu_allow_layout_negotiation=true",
    "dot_after_layout": "--xla_tpu_order_dot_after_layout=true",
    "dot_grouping": "--xla_tpu_layout_use_dot_grouping=true",
    "aggressive_loop_fusion_layout": "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "autotune_dots_fusions": "--xla_tpu_autotune_dots=true --xla_tpu_autotune_fusions=true",
    "copy_elision_10x": "--xla_tpu_copy_elision_analysis_allowance=300000",
}


def run_config(name, flags, shapes, variants, timeout=2400):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    env["FAB_SHAPES"] = shapes
    env["FAB_VARIANTS"] = variants
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "probe_fab_block.py")],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    out = proc.stdout + proc.stderr
    # parse "blkX   12.34 ms (err 1.2e-03, compile 45s)" lines
    times = {}
    for m in re.finditer(r"(blk\w+)\s+([0-9.]+) ms \(err ([0-9.e+-]+)", out):
        times[m.group(1)] = {"ms": float(m.group(2)), "err": float(m.group(3))}
    rec = {"flags": flags, "times": times,
           "wall_s": round(time.time() - t0, 1)}
    if proc.returncode != 0 and not times:
        rec["error"] = out[-2000:]
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="928,32,32,64")
    p.add_argument("--variants", default="blkA,blkD")
    p.add_argument("--configs", default=",".join(CONFIGS))
    args = p.parse_args()

    results = {}
    for name in args.configs.split(","):
        flags = CONFIGS[name]
        print(f"=== {name}: {flags or '(baseline)'}", flush=True)
        rec = run_config(name, flags, args.shapes, args.variants)
        results[name] = rec
        print(json.dumps(rec), flush=True)
        with open(os.path.join(HERE, "results_xla_flags.json"), "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
