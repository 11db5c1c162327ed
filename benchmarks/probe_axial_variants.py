"""Compare XLA formulations of the FAB axial apply + instance norm.

V1 (round-1 default): block-diagonal packing -> reshape -> bmm -> transpose
    -> reshape -> bmm. HLO shows 7 full-tensor layout copies around the dots.
V2: two multi-free-dim dot_generals directly on the 5D head-major tensor
    ('bnij,bnjwd->bniwd' then contract w) — no reshapes or transposes in
    the source; XLA chooses the lowering.
V3: V2 with (b, n) merged into one batch dim.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np

from lns_tpu.ops.factorized_attention import (
    axial_apply_headmajor,
    instance_norm_headmajor,
)


def v1(kx, ky, phi):
    return instance_norm_headmajor(axial_apply_headmajor(kx, ky, phi))


def v2(kx, ky, phi):
    # row: contract j over H; col: contract m over W — free dims ride along
    a = jnp.einsum("bnij,bnjwd->bniwd", kx, phi)
    a = jnp.einsum("bnlm,bnimd->bnild", ky, a)
    return instance_norm_headmajor(a)


def v3(kx, ky, phi):
    b, n, h, w, d = phi.shape
    kxm = kx.reshape(b * n, h, h)
    kym = ky.reshape(b * n, w, w)
    p = phi.reshape(b * n, h, w, d)
    a = jnp.einsum("gij,gjwd->giwd", kxm, p)
    a = jnp.einsum("glm,gimd->gild", kym, a)
    return instance_norm_headmajor(a.reshape(b, n, h, w, d))


def timed(fn, args, n=20):
    chained = jax.jit(
        lambda a, k: jax.lax.fori_loop(
            0, k,
            lambda i, c: (c[0], c[1], c[2] + 1e-6 * fn(c[0], c[1], c[2])),
            a,
        )[2][0, 0, 0, 0, 0]
    )
    np.asarray(chained(args, 1))

    def run(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(args, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(1 + n) - run(1)) / n


def bench(b, heads, h, w, d, dtype=jnp.bfloat16):
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    kx = (jax.random.normal(k1, (b, heads, h, h)) / h).astype(dtype)
    ky = (jax.random.normal(k2, (b, heads, w, w)) / w).astype(dtype)
    phi = jax.random.normal(k3, (b, heads, h, w, d)).astype(dtype)
    ref = np.asarray(jax.jit(v1)(kx, ky, phi), np.float32)
    res = [f"[{b},{heads},{h},{w},{d}]"]
    for name, fn in [("v1", v1), ("v2", v2), ("v3", v3)]:
        out = np.asarray(jax.jit(fn)(kx, ky, phi), np.float32)
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t = timed(fn, (kx, ky, phi))
        res.append(f"{name} {t*1e3:7.2f} ms (err {err:.1e})")
    print(" | ".join(res))


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench(928, 8, 32, 32, 64)
    bench(928, 8, 16, 16, 64)
    bench(336, 8, 48, 96, 64)
    bench(336, 8, 24, 48, 64)
