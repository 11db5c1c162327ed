"""Pure-DMA Pallas bandwidth probe: copy [928,2,128,2048] bf16 (0.97 GB)
block-by-block with varying samples-per-step, plus the same for the bmm.
Separates per-grid-step scalar overhead from DMA throughput limits.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(fn, args, n=20):
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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pallas_copy(x, s):
    b, g, m, n = x.shape
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // s, g),
        in_specs=[pl.BlockSpec((s, 1, m, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((s, 1, m, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x)


def _bmm_kernel(k_ref, x_ref, o_ref, *, s):
    for p in range(s):
        o_ref[p, 0] = jnp.dot(
            k_ref[p, 0], x_ref[p, 0], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def pallas_bmm(kb, x, s):
    b, g, m, n = x.shape
    return pl.pallas_call(
        functools.partial(_bmm_kernel, s=s),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // s, g),
        in_specs=[
            pl.BlockSpec((s, 1, m, m), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1, m, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, 1, m, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(kb, x)


def main():
    log(f"devices: {jax.devices()}")
    b, g, m, n = 928, 2, 128, 2048
    x = jax.random.normal(jax.random.key(0), (b, g, m, n)).astype(jnp.bfloat16)
    kb = jax.random.normal(jax.random.key(1), (b, g, m, m)).astype(jnp.bfloat16) / m
    gb = x.size * 2 / 2**30

    # XLA elementwise baseline (read+write of x)
    t = timed(lambda a: a * 1.0001, (x,))
    log(f"XLA eltwise r+w: {t*1e3:7.2f} ms ({2*gb/t:.0f} GB/s)")

    for s in (2, 4, 8, 16, 29, 58):
        if b % s:
            continue
        steps = (b // s) * g
        try:
            t = timed(lambda a, k: pallas_copy(a, s), (x, kb))
            log(f"pallas_copy  s={s:3d} ({steps:4d} steps): {t*1e3:7.2f} ms "
                f"({2*gb/t:.0f} GB/s, {t/steps*1e6:5.1f} us/step)")
        except Exception as e:
            log(f"pallas_copy s={s}: {type(e).__name__} {str(e)[:90]}")
    for s in (2, 4, 8, 16, 29):
        steps = (b // s) * g
        try:
            t = timed(lambda a, k: pallas_bmm(k, a, s), (x, kb))
            log(f"pallas_bmm   s={s:3d} ({steps:4d} steps): {t*1e3:7.2f} ms "
                f"({2*gb/t:.0f} GB/s, {t/steps*1e6:5.1f} us/step)")
        except Exception as e:
            log(f"pallas_bmm s={s}: {type(e).__name__} {str(e)[:90]}")
    log("DONE")


if __name__ == "__main__":
    main()
