"""Compare formulations of the FAB axial apply + instance norm on-device.

v1: round-1 default — blockdiag + reshape + XLA bmm + transpose + bmm.
    HLO shows 7 full-tensor layout copies around the dots.
v8: all-Pallas layout-pinned pipeline (bmm / transpose / bmm / transpose).
v8nf: v8 without the final transpose-back — IN computed on the w-major
    tensor (what FABlock2D consumes via a swapped out-projection einsum).

(v2/v3 multi-free-dim dot_generals were dropped: compile exceeds 10 min at
these shapes — the round-1 'batched-dot compile explosion'.)
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
from lns_tpu.pallas_kernels.axial_pipeline import axial_apply_pipeline, transpose_hw


def v1(kx, ky, phi):
    return instance_norm_headmajor(axial_apply_headmajor(kx, ky, phi))


def v8(kx, ky, phi):
    return instance_norm_headmajor(axial_apply_pipeline(kx, ky, phi))


def v8nf(kx, ky, phi):
    from lns_tpu.pallas_kernels.axial_fused import blockdiag_embed
    from lns_tpu.pallas_kernels.axial_pipeline import bmm_blockdiag

    b, heads, h, w, d = phi.shape
    group = 1
    for g in (1, 2, 4, 8):
        if heads % g == 0 and g * min(h, w) <= 128:
            group = g
    gg = heads // group
    kxb = blockdiag_embed(kx.astype(phi.dtype), group)
    kyb = blockdiag_embed(ky.astype(phi.dtype), group)
    x = bmm_blockdiag(kxb, phi.reshape(b, gg, group * h, w * d))
    x = transpose_hw(x.reshape(b, heads, h, w, d))
    x = bmm_blockdiag(kyb, x.reshape(b, gg, group * w, h * d))
    # w-major result; IN is permutation-invariant over (h, w)
    return instance_norm_headmajor(x.reshape(b, heads, w, h, d))


def timed(fn, args, n=20):
    # scalar-sum carry: shape-agnostic data dependency (adds one identical
    # read pass to every variant)
    chained = jax.jit(
        lambda a, k: jax.lax.fori_loop(
            0, k,
            lambda i, c: (c[0], c[1],
                          c[2] + (1e-6 * jnp.sum(fn(c[0], c[1], c[2]))).astype(c[2].dtype)),
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
    for name, fn in [("v1", v1), ("v8", v8), ("v8nf", v8nf)]:
        out = np.asarray(jax.jit(fn)(kx, ky, phi), np.float32)
        if name == "v8nf":
            out = out.transpose(0, 1, 3, 2, 4)  # back to h-major for compare
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t = timed(fn, (kx, ky, phi))
        res.append(f"{name} {t*1e3:7.2f} ms (err {err:.1e})")
    print(" | ".join(res), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench(928, 8, 32, 32, 64)
    bench(928, 8, 16, 16, 64)
    bench(336, 8, 48, 96, 64)
    bench(336, 8, 24, 48, 64)
