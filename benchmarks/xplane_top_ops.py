"""Trace a function on the TPU and print the top device ops by total time.

Captures a jax.profiler trace of N chained executions, parses the XSpace
proto (xprof package) from the dump, and aggregates XEvent durations on
the device planes by HLO op name. This is ground truth for where decode
time goes (static HLO audits can't see actual overlap/fusion costs).

Usage:
  python benchmarks/xplane_top_ops.py --what blkA   # probe_fab_block blkA
  python benchmarks/xplane_top_ops.py --what decode # full NS2d decode
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np


def parse_xspace(logdir, top=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA Ops line carries per-HLO timing
            if line.name not in ("XLA Ops", "XLA TraceMe", "Steps"):
                if "Ops" not in line.name:
                    continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if not totals:
            continue
        print(f"=== plane: {plane.name} (total {sum(totals.values()):.2f} ms)")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.3f} ms x{counts[name]:4d}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="blkA")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--logdir", default="/tmp/xptrace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        import shutil

        shutil.rmtree(args.logdir, ignore_errors=True)

        from benchmarks import probe_fab_block as pb

        b, h, w, c, heads, d = 928, 32, 32, 64, 8, 64
        ks = jax.random.split(jax.random.key(0), 6)
        dtype = jnp.bfloat16
        u = jax.random.normal(ks[0], (b, h, w, c)).astype(dtype)
        kx = (jax.random.normal(ks[1], (b, heads, h, h)) / h).astype(dtype)
        ky = (jax.random.normal(ks[2], (b, heads, w, w)) / w).astype(dtype)
        w_in = (jax.random.normal(ks[3], (c, heads, d)) / c**0.5).astype(dtype)
        w_o1 = (jax.random.normal(ks[4], (heads, d, c)) / (heads * d) ** 0.5).astype(dtype)
        w_o2 = (jax.random.normal(ks[5], (c, c)) / c**0.5).astype(dtype)
        fargs = (u, kx, ky, w_in, w_o1, w_o2)

        if args.what in ("rollout", "sw_rollout", "twophase_rollout"):
            # the actual benchmark program: encode -> scan -> chunked decode
            from benchmarks.run_benchmarks import (DEFAULT_DECODE_CHUNK,
                                                   WORKLOADS)
            from lns_tpu.models import LatentDynamics

            wname = {"rollout": "ns2d", "sw_rollout": "sw",
                     "twophase_rollout": "twophase"}[args.what]
            cfg_fn, shape, steps, batch = WORKLOADS[wname]
            chunk = DEFAULT_DECODE_CHUNK.get(wname)
            model = LatentDynamics(cfg_fn(), dtype=dtype, ae_dtype=dtype)
            x = jax.random.normal(jax.random.PRNGKey(1), (batch,) + shape,
                                  jnp.float32)
            params = model.init(jax.random.PRNGKey(0), x.shape)["params"]

            @jax.jit
            def run(x):
                return model.predict(params, x, steps=steps, to_x=True,
                                     decode_chunk=chunk)

            np.asarray(run(x)[0, 0, 0, 0, 0])
            with jax.profiler.trace(args.logdir):
                for _ in range(args.reps):
                    y = run(x)
                np.asarray(y[0, 0, 0, 0, 0])
        elif args.what in ("decode", "sw_decode"):
            from lns_tpu.models.autoencoder import SimpleAutoencoder

            if args.what == "sw_decode":
                # SW benchmark decode shape: 42 steps x batch 8 = 336 frames
                from benchmarks.run_benchmarks import sw_cfg

                cfg = sw_cfg()
                z_shape, x_shape = (336, 12, 24, 64), (2, 96, 192, 3)
            else:
                from __graft_entry__ import _ns2d_cfg

                cfg = _ns2d_cfg()
                z_shape, x_shape = (928, 8, 8, 16), (2, 64, 64, 1)
            ae = SimpleAutoencoder(cfg, dtype=dtype)
            z = jax.random.normal(jax.random.PRNGKey(0), z_shape, jnp.float32)
            variables = ae.init(jax.random.PRNGKey(1), jnp.zeros(x_shape))
            aparams = variables["params"]

            @jax.jit
            def run(z):
                return ae.apply({"params": aparams}, z, method=lambda m, zz: m.decode(zz))

            np.asarray(run(z)[0, 0, 0, 0])
            with jax.profiler.trace(args.logdir):
                for _ in range(args.reps):
                    y = run(z)
                np.asarray(y[0, 0, 0, 0])
        else:
            fn = {"blkA": pb.blkA, "blkB": pb.blkB, "blkC": pb.blkC,
                  "blkD": pb.blkD, "blkF": pb.blkF, "blkG": pb.blkG,
                  "blkH": pb.blkH, "blkK": pb.blkK}[args.what]
            jfn = jax.jit(fn)
            np.asarray(jfn(*fargs)[0, 0, 0, 0])
            with jax.profiler.trace(args.logdir):
                for _ in range(args.reps):
                    y = jfn(*fargs)
                np.asarray(y[0, 0, 0, 0])
        time.sleep(2)

    parse_xspace(args.logdir, args.top)


if __name__ == "__main__":
    main()
