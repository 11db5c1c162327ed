"""Probe: right-multiply column apply (no h<->w transpose at all).

v1:  round-1/2 default — blockdiag row bmm + transpose + blockdiag col bmm
     + transpose (XLA inserts batch-minor layout copies around these).
v8:  all-Pallas pipeline (bmm/transpose/bmm), w-major output.
v9:  blockdiag row bmm (XLA) + col apply as a RIGHT-multiply dot
     ('bnhwd,bnlw->bnhdl') — no spatial transpose anywhere; the consumer
     (out-projection einsum) absorbs the [*, d, l] axis order.
v9p: v9 with the row bmm done by the Pallas layout-pinned kernel.

All variants end with the head-major instance norm (axis set adjusted to
each variant's layout) so the comparison covers the full FAB core.
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
    _blockdiag,
    _pack_group,
    axial_apply_headmajor,
    instance_norm_headmajor,
)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def v1(kx, ky, phi):
    return instance_norm_headmajor(axial_apply_headmajor(kx, ky, phi))


def v8(kx, ky, phi):
    from lns_tpu.pallas_kernels.axial_pipeline import axial_apply_pipeline

    out = axial_apply_pipeline(kx, ky, phi, final_transpose=False)
    return instance_norm_headmajor(out)  # w-major; caller compares transposed


def _row_apply_xla(kx, phi):
    b, heads, h, w, d = phi.shape
    g = _pack_group(heads, h)
    kxb = _blockdiag(kx, g)
    ph = phi.reshape(b, heads // g, g * h, w * d)
    ph = jnp.einsum("bgxy,bgyz->bgxz", kxb, ph)
    return ph.reshape(b, heads, h, w, d)


def v9(kx, ky, phi):
    x = _row_apply_xla(kx, phi)
    # col: out[b,n,h,d,l] = sum_w ky[b,n,l,w] x[b,n,h,w,d]
    x = jnp.einsum("bnhwd,bnlw->bnhdl", x, ky)
    # instance norm over spatial (h, l) = axes (2, 4)
    mean = jnp.mean(x, axis=(2, 4), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean), axis=(2, 4), keepdims=True
    )
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def v9p(kx, ky, phi):
    from lns_tpu.pallas_kernels.axial_fused import blockdiag_embed
    from lns_tpu.pallas_kernels.axial_pipeline import bmm_blockdiag

    b, heads, h, w, d = phi.shape
    g = _pack_group(heads, h)
    kxb = blockdiag_embed(kx.astype(phi.dtype), g)
    x = bmm_blockdiag(kxb, phi.reshape(b, heads // g, g * h, w * d))
    x = x.reshape(b, heads, h, w, d)
    x = jnp.einsum("bnhwd,bnlw->bnhdl", x, ky)
    mean = jnp.mean(x, axis=(2, 4), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean), axis=(2, 4), keepdims=True
    )
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def timed(fn, args, n=20):
    chained = jax.jit(
        lambda a, k: jax.lax.fori_loop(
            0, k,
            lambda i, c: (c[0], c[1],
                          c[2] + (1e-6 * jnp.sum(fn(c[0], c[1], c[2]))).astype(c[2].dtype)),
            a,
        )[2][0, 0, 0, 0, 0]
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


def to_hmajor(name, out):
    if name == "v8":
        return out.transpose(0, 1, 3, 2, 4)  # w-major -> h-major
    if name in ("v9", "v9p"):
        return out.transpose(0, 1, 2, 4, 3)  # [b,n,h,d,l] -> [b,n,h,l,d]
    return out


def bench(b, heads, h, w, d, variants, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    kx = (jax.random.normal(k1, (b, heads, h, h)) / h).astype(dtype)
    ky = (jax.random.normal(k2, (b, heads, w, w)) / w).astype(dtype)
    phi = jax.random.normal(k3, (b, heads, h, w, d)).astype(dtype)
    ref = np.asarray(jax.jit(v1)(kx, ky, phi), np.float32)
    res = [f"[{b},{heads},{h},{w},{d}]"]
    for name, fn in variants:
        t0c = time.time()
        out = np.asarray(to_hmajor(name, jax.jit(fn)(kx, ky, phi)), np.float32)
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t = timed(fn, (kx, ky, phi))
        res.append(f"{name} {t*1e3:7.2f} ms (err {err:.1e}, compile {time.time()-t0c:.0f}s)")
        log(" | ".join(res))


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    VAR = [("v1", v1), ("v9", v9), ("v9p", v9p), ("v8", v8)]
    bench(928, 8, 32, 32, 64, VAR)
    bench(928, 8, 16, 16, 64, VAR)
    bench(336, 8, 48, 96, 64, VAR)
    bench(336, 8, 24, 48, 64, VAR)
