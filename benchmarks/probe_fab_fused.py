"""Correctness + timing probe for the fused FAB axial+IN Pallas kernel
(lns_tpu.pallas_kernels.axial_fused) at NS2d benchmark shapes.

Compares against the XLA head-major path (axial_apply_headmajor +
instance_norm_headmajor) and times both with the chained-loop protocol.
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
from lns_tpu.pallas_kernels.axial_fused import fab_axial_in_fused


def xla_ref(kx, ky, phi):
    return instance_norm_headmajor(axial_apply_headmajor(kx, ky, phi))


def check(b, heads, h, w, d, dtype):
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    kx = (jax.random.normal(k1, (b, heads, h, h)) / h).astype(dtype)
    ky = (jax.random.normal(k2, (b, heads, w, w)) / w).astype(dtype)
    phi = jax.random.normal(k3, (b, heads, h, w, d)).astype(dtype)

    try:
        ref = np.asarray(jax.jit(xla_ref)(kx, ky, phi), np.float32)
        out = np.asarray(jax.jit(fab_axial_in_fused)(kx, ky, phi), np.float32)
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"  [{b},{heads},{h},{w},{d}] {dtype.__name__}: rel-max-err {err:.2e}")
        return err
    except Exception as e:
        print(f"  [{b},{heads},{h},{w},{d}] {dtype.__name__}: "
              f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")
        return None


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

    t1 = run(1)
    tn = run(1 + n)
    return (tn - t1) / n


def bench(b, heads, h, w, d, dtype=jnp.bfloat16):
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    kx = (jax.random.normal(k1, (b, heads, h, h)) / h).astype(dtype)
    ky = (jax.random.normal(k2, (b, heads, w, w)) / w).astype(dtype)
    phi = jax.random.normal(k3, (b, heads, h, w, d)).astype(dtype)
    t_xla = timed(xla_ref, (kx, ky, phi))
    t_pl = timed(fab_axial_in_fused, (kx, ky, phi))
    gb = 2 * phi.size * phi.dtype.itemsize / 2**30
    print(f"  [{b},{heads},{h},{w},{d}]: xla {t_xla*1e3:7.2f} ms | "
          f"pallas {t_pl*1e3:7.2f} ms | bw-floor {gb/0.8*1e3:6.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    print("correctness:")
    check(4, 8, 32, 32, 64, jnp.float32)
    check(4, 8, 32, 32, 64, jnp.bfloat16)
    check(4, 8, 16, 16, 64, jnp.bfloat16)
    check(4, 8, 24, 48, 64, jnp.bfloat16)   # SW mid level
    check(4, 8, 48, 96, 64, jnp.bfloat16)   # SW top level
    check(4, 8, 15, 30, 64, jnp.bfloat16)   # two-phase odd sizes
    print("timing (NS2d bench scale):")
    bench(928, 8, 16, 16, 64)
    bench(928, 8, 32, 32, 64)
    print("timing (SW bench scale, 336 frames):")
    bench(336, 8, 24, 48, 64)
    bench(336, 8, 48, 96, 64)
