#!/usr/bin/env python
"""Generate an NS2d training corpus with the built-in pseudo-spectral
Navier-Stokes solver (lns_tpu/data/ns2d_solver.py) in the exact npz layout
the NS2d datasets consume (keys all_sol_center/forward/backward,
[T, H, W, Ncase] — dataset/ns2d_fno_stage1.py in the reference).

The reference repo ships no data generator; this produces FNO-regime
forced turbulence (GRF initial vorticity, fixed sinusoidal forcing,
visc 1e-4) so the full two-stage pipeline can be trained end-to-end
without external datasets. Runs on TPU (jitted scan) or CPU.

    python scripts/generate_ns2d_data.py --out ns2d.npz [--ncase 128]
        [--case-len 30] [--n 64] [--visc 1e-4] [--t-record 1.0] [--seed 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--ncase", type=int, default=128)
    p.add_argument("--case-len", type=int, default=30)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--visc", type=float, default=1e-4)
    p.add_argument("--t-record", type=float, default=1.0)
    p.add_argument("--dt", type=float, default=2.5e-4)
    p.add_argument("--spinup", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from lns_tpu.data.ns2d_solver import make_ns2d_solver_npz

    t0 = time.time()
    path = make_ns2d_solver_npz(
        args.out, ncase=args.ncase, case_len=args.case_len, n=args.n,
        visc=args.visc, t_record=args.t_record, seed=args.seed, dt=args.dt,
        spinup_records=args.spinup)
    print(f"wrote {path} ({args.ncase} cases x {args.case_len} frames "
          f"@ {args.n}x{args.n}) in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
