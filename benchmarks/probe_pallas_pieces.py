"""Timed measurements of the individual Pallas kernels at bench shapes.

Establishes (a) the per-grid-step scalar-core overhead slope and (b) the
achievable HBM throughput of each piece, to size the all-in-one fused FAB
kernel (see DESIGN.md round-2 notes).
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


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(fn, args, n=20):
    """args: tuple whose first element is the carried tensor. Adds one
    read pass (jnp.sum) per iteration as the anti-DCE data dependency —
    identical across variants (same convention as probe_axial_v9)."""
    chained = jax.jit(
        lambda a, k: jax.lax.fori_loop(
            0, k,
            lambda i, c: (c[0] + (1e-6 * jnp.sum(fn(*c))).astype(c[0].dtype),)
            + c[1:],
            a,
        )[0].ravel()[0]
    )
    np.asarray(chained(args, 1))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(args, 1))
        t1 = time.perf_counter()
        np.asarray(chained(args, 1 + n))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / n)
    return best


def main():
    log(f"devices: {jax.devices()}")
    from lns_tpu.pallas_kernels.axial_fused import (
        blockdiag_embed,
        fab_axial_in_fused,
    )
    from lns_tpu.pallas_kernels.axial_pipeline import bmm_blockdiag, transpose_hw

    b, heads, h, w, d = 928, 8, 32, 32, 64
    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.key(0), 3)
    kx = (jax.random.normal(ks[0], (b, heads, h, h)) / h).astype(dtype)
    ky = (jax.random.normal(ks[1], (b, heads, w, w)) / w).astype(dtype)
    phi = jax.random.normal(ks[2], (b, heads, h, w, d)).astype(dtype)
    gb = phi.size * 2 / 2**30

    # 1. bmm_blockdiag [928, 2, 128, 2048]
    kxb = jax.jit(lambda k: blockdiag_embed(k, 4))(kx)
    x4 = phi.reshape(b, 2, 4 * h, w * d)
    t = timed(lambda a, k: bmm_blockdiag(k, a), (x4, kxb))
    log(f"bmm_blockdiag s-auto: {t*1e3:7.2f} ms "
        f"({2*gb/t:.0f} GB/s effective, floor ~{2*gb/0.8:.1f} ms@819GB/s)")

    # 2. transpose_hw [928, 8, 32, 32, 64]
    t = timed(lambda a: transpose_hw(a), (phi,))
    log(f"transpose_hw: {t*1e3:7.2f} ms ({2*gb/t:.0f} GB/s effective)")

    # 3. fused axial+IN, g=4 (grid 928x2, s=1)
    t = timed(lambda a, x, y: fab_axial_in_fused(x, y, a), (phi, kx, ky))
    log(f"fab_axial_in_fused g4: {t*1e3:7.2f} ms ({2*gb/t:.0f} GB/s effective)")

    # 4. XLA reference points
    from lns_tpu.ops.factorized_attention import (
        axial_apply_headmajor,
        instance_norm_headmajor,
    )

    t = timed(lambda a, x, y: axial_apply_headmajor(x, y, a), (phi, kx, ky))
    log(f"XLA axial_apply_headmajor: {t*1e3:7.2f} ms")
    t = timed(lambda a: instance_norm_headmajor(a), (phi,))
    log(f"XLA instance_norm alone: {t*1e3:7.2f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
