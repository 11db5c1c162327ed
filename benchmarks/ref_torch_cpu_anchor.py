"""Measured anchor for the A100 baseline estimate: execute the REFERENCE
implementation's NS2d rollout (decode inside the Python loop,
train_stage2_ns2d.py:143-158) with torch on this machine's CPU and report
frames/s.

The reference publishes no throughput numbers and no A100 exists in this
environment, so bench.py divides by an analytic A100 estimate (BASELINE.md).
This script bounds that estimate from a measurement: reference-on-CPU
frames/s x published A100/CPU throughput ratios for small-conv inference
(~10-40x) brackets the A100 number independently of the analytic FLOP model.

Usage: python benchmarks/ref_torch_cpu_anchor.py [--batch 32] [--steps 29]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import yaml

from _reference import load_reference, reference_namespace

CFG_DIR = "/root/reference/configs"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=29)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    ref = load_reference()
    assert ref is not None, "reference tree unavailable"

    raw = yaml.safe_load(open(f"{CFG_DIR}/ns2d_atage1_ae.yml"))
    raw.setdefault("disable_coarse_attn", None)
    raw.setdefault("use_attn_enc", None)
    ns_ae = reference_namespace(raw)
    ae = ref.autoencoder2d.SimpleAutoencoder(ns_ae).eval()

    raw2 = yaml.safe_load(open(f"{CFG_DIR}/ns2d_stage2_prop.yml"))
    t = ref.trainers["train_stage2_ns2d"]
    prop = t.SimpleCNN(raw2["latent_dim"], raw2["prop_n_block"],
                       raw2["prop_n_embd"], raw2.get("dilation", 2)).eval()

    x = torch.randn(args.batch, 1, 64, 64)
    with torch.no_grad():
        z = ae.encode(x)

        def rollout():
            zz = z
            outs = []
            for _ in range(args.steps):
                zz = prop(zz)
                outs.append(ae.decode(zz))  # decode INSIDE the loop,
                # exactly the reference predict (train_stage2_ns2d.py:147-157)
            return torch.stack(outs, dim=1)

        rollout()  # warmup
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            rollout()
            best = min(best, time.perf_counter() - t0)

    fps = args.batch * args.steps / best
    print(json.dumps({
        "metric": "reference_torch_cpu_rollout_frames_per_sec",
        "value": round(fps, 1),
        "threads": torch.get_num_threads(),
        "cpus": os.cpu_count(),
        "rollout_ms": round(best * 1e3, 1),
        "batch": args.batch,
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
