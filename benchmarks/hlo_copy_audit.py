"""Audit the optimized HLO of FAB-core formulations for layout-copy traffic.

Compiles each variant at the NS2d bench shape and walks the optimized HLO,
summing the output bytes of copy/transpose/reshape-materializing
instructions plus every fusion whose root is one. This is the static
counterpart of the profiler: the decode's non-matmul time is almost
entirely these relayout passes (DESIGN.md 'Factorized attention').

Usage: python benchmarks/hlo_copy_audit.py [--shape 928,8,32,32,64]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "c64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def out_bytes(line: str) -> int:
    # lines look like: %name = bf16[928,8,32,32]{0,3,2,1:T(8,128)(2,1)} copy(...)
    rhs = line.split("=", 1)[1] if "=" in line else line
    m = SHAPE_RE.search(rhs)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def audit(hlo: str, label: str, top: int = 12):
    total = {"copy": 0, "transpose": 0, "dot": 0, "fusion": 0, "all": 0}
    lines = []
    for line in hlo.splitlines():
        ls = line.strip()
        if not ("=" in ls and "(" in ls):
            continue
        b = out_bytes(ls)
        total["all"] += b
        for kind in ("copy", "transpose", "fusion"):
            if re.search(rf"= *\S+ {kind}\(", ls):
                total[kind] += b
                if b > 32 * 2**20:
                    lines.append((b, ls[:160]))
        if " dot(" in ls or "convolution(" in ls:
            total["dot"] += b
    print(f"--- {label}")
    for k, v in total.items():
        print(f"  {k:10s} {v/2**20:10.1f} MiB")
    for b, ls in sorted(lines, reverse=True)[:top]:
        print(f"    {b/2**20:8.1f} MiB  {ls}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="928,8,32,32,64")
    ap.add_argument("--variants", default="v1,v9")
    args = ap.parse_args()
    b, heads, h, w, d = map(int, args.shape.split(","))

    from benchmarks.probe_axial_v9 import v1, v9, v9p

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    kx = (jax.random.normal(k1, (b, heads, h, h)) / h).astype(jnp.bfloat16)
    ky = (jax.random.normal(k2, (b, heads, w, w)) / w).astype(jnp.bfloat16)
    phi = jax.random.normal(k3, (b, heads, h, w, d)).astype(jnp.bfloat16)

    for name in args.variants.split(","):
        fn = {"v1": v1, "v9": v9, "v9p": v9p}[name]
        txt = jax.jit(fn).lower(kx, ky, phi).compile().as_text()
        audit(txt, name)


if __name__ == "__main__":
    main()
