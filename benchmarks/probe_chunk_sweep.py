"""Re-sweep decode_chunk x batch for the fused rollout after the blkK
FAB core and the Pallas scan landed (the chunk=116 default was tuned
against the blkG core; per-block timings moved -32%, so the optimum may
have shifted).

Run on the real TPU. Prints one JSON line per config.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.run_benchmarks import bench_workload  # noqa: E402


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="ns2d")
    p.add_argument("--batches", type=str, nargs="*", default=None)
    p.add_argument("--chunks", type=str, nargs="*", default=None)
    args = p.parse_args()
    # accept both space- and comma-separated lists
    if args.batches:
        args.batches = [int(b) for tok in args.batches
                        for b in tok.split(",") if b]
    if args.chunks:
        args.chunks = [c for tok in args.chunks for c in tok.split(",") if c]

    if args.workload == "ns2d":
        grid = [(32, 58), (32, 116), (32, 232), (32, 464),
                (16, 116), (64, 116), (64, 232)]
    else:  # sw: 8x42 = 336 frames
        grid = [(8, None), (8, 42), (8, 84), (8, 168), (16, 84)]
    if bool(args.batches) != bool(args.chunks):
        p.error("--batches and --chunks must be given together")
    if args.batches and args.chunks:
        grid = [(b, None if c == "none" else int(c))
                for b in args.batches for c in args.chunks]

    results = []
    for batch, chunk in grid:
        r = bench_workload(args.workload, batch=batch, decode_chunk=chunk)
        row = {"workload": args.workload, "batch": batch, "chunk": chunk, **r}
        print(json.dumps(row), flush=True)
        results.append(row)

    best = max(results, key=lambda r: r["frames_per_sec_per_chip"])
    print("BEST:", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
