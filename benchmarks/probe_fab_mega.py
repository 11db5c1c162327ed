"""Mosaic feasibility + timing probes for the FAB apply-pair megakernel
(VERDICT r4 item 1: own the inter-apply layout inside one Pallas program).

The apply-pair is two chained axial contractions on a [h, w, c] tensor; the
second contraction's axis is interior after the first, so SOME relayout is
inherent. XLA pays it as an HBM round-trip (fusion.1939/1945); in VMEM it
should be ~free — IF Mosaic can express it. These probes establish, on the
real chip, which of the candidate in-kernel forms compile and what they
cost at the NS2d chunk shape (b=116, heads=8, 32x32, c=64, bf16):

  A. rank-3 dot_general, interior contraction  (no transpose at all)
  B. in-VMEM swapaxes(0, 1) of [l, h, c]       (major-dim transpose)
  C. leading-collapse reshape [l, h, c] -> [(l h), c]
  D. minor-split reshape [l, h*c] -> [l, h, c]
  E. full stats-pass chain (apply pair + Gram + colsum, nothing big written)
  F. full apply-pass chain (apply pair + per-(b,n) c->o projection folded,
     accumulated over heads in a VMEM scratch)

E+F compose into the two-pass "stats + recompute" FAB core: per block the
only HBM traffic is u in (twice) and the [b, h, w, o] projection out — the
121 MB/chunk (NS2d) / 15.9 GB/rollout (SW) head-major value tensor never
exists. Run: python benchmarks/probe_fab_mega.py
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
    """Chained-difference protocol (BASELINE.md measured-environment note)."""
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


B, N, H, W, C = 116, 8, 32, 32, 64
DT = jnp.bfloat16


def mk(seed, shape, scale=1.0):
    return (scale * jax.random.normal(jax.random.key(seed), shape)).astype(DT)


# ---------------------------------------------------------------------------
# piece probes: one tiny pallas_call each, try/except on compile
# ---------------------------------------------------------------------------

def piece(name, kernel, operands, out_shape):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in operands],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        out = np.asarray(fn(*operands), np.float32)
        log(f"  piece {name}: OK (out {out.shape}, finite={np.isfinite(out).all()})")
        return True
    except Exception as e:
        log(f"  piece {name}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")
        return False


def run_pieces():
    a3 = mk(0, (H, W, C))     # [l, h, c]-like
    kx = mk(1, (H, H), 1 / H)

    def k_rank3_dot(a_ref, k_ref, o_ref):
        # interior contraction: kx[i, h] * a[l, h, c] -> [i, l, c]
        o_ref[...] = jax.lax.dot_general(
            k_ref[...], a_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    piece("A rank3-dot interior", k_rank3_dot, (a3, kx),
          jax.ShapeDtypeStruct((H, H, C), DT))

    def k_swap(a_ref, o_ref):
        o_ref[...] = jnp.swapaxes(a_ref[...], 0, 1)

    piece("B swapaxes(0,1) [l,h,c]", k_swap, (a3,),
          jax.ShapeDtypeStruct((W, H, C), DT))

    def k_collapse(a_ref, o_ref):
        o_ref[...] = a_ref[...].reshape(H * W, C)

    piece("C leading-collapse -> [(l h), c]", k_collapse, (a3,),
          jax.ShapeDtypeStruct((H * W, C), DT))

    a2 = mk(2, (H, W * C))

    def k_split(a_ref, o_ref):
        o_ref[...] = a_ref[...].reshape(H, W, C)

    piece("D minor-split [l, h*c] -> [l, h, c]", k_split, (a2,),
          jax.ShapeDtypeStruct((H, W, C), DT))

    def k_swap_then_dot(a_ref, k_ref, o_ref):
        at = jnp.swapaxes(a_ref[...], 0, 1).reshape(H, W * C)
        o_ref[...] = jnp.dot(k_ref[...], at,
                             preferred_element_type=jnp.float32).astype(o_ref.dtype)

    piece("B2 swap+collapse+dot", k_swap_then_dot, (a3, kx),
          jax.ShapeDtypeStruct((H, W * C), DT))


# ---------------------------------------------------------------------------
# E: stats pass — grid (b, n), n fastest; u block constant in n
# ---------------------------------------------------------------------------

def _stats_kernel(u_ref, kx_ref, ky_ref, g_ref, s_ref, *, mode):
    u = u_ref[0]                       # [w, h, c]  (pre-transposed outside)
    ky = ky_ref[0, 0]                  # [l, w]
    kx = kx_ref[0, 0]                  # [i, h]
    # first apply (contract w): A[l, h, c]
    if mode == "rank3":
        a = jax.lax.dot_general(ky, u, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(u.dtype)
        # second apply (contract h, interior of a): B[i, l, c]
        bb = jax.lax.dot_general(kx, a, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        b2 = bb.astype(u.dtype).reshape(H * W, C)
    else:  # swap
        a = jax.lax.dot_general(ky, u.reshape(W, H * C),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(u.dtype)
        at = jnp.swapaxes(a.reshape(W, H, C), 0, 1).reshape(H, W * C)
        bb = jnp.dot(kx, at, preferred_element_type=jnp.float32)
        b2 = bb.astype(u.dtype).reshape(H * W, C)
    g_ref[0, 0] = jax.lax.dot_general(b2, b2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    s_ref[0, 0] = jnp.sum(b2.astype(jnp.float32), axis=0, keepdims=True)


def stats_pass(u_t, kx, ky, mode):
    return pl.pallas_call(
        functools.partial(_stats_kernel, mode=mode),
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, W, H, C), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, H), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(u_t, kx, ky)


# ---------------------------------------------------------------------------
# F: apply pass — same chain, fold per-(b, n) m [c, o], accumulate over n
# ---------------------------------------------------------------------------

def _apply_kernel(u_ref, kx_ref, ky_ref, m_ref, bias_ref, o_ref, acc_ref,
                  *, mode):
    jn = pl.program_id(1)
    u = u_ref[0]
    ky = ky_ref[0, 0]
    kx = kx_ref[0, 0]
    if mode == "rank3":
        a = jax.lax.dot_general(ky, u, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(u.dtype)
        bb = jax.lax.dot_general(kx, a, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        b2 = bb.astype(u.dtype).reshape(H * W, C)      # [(i l), c]
    else:
        a = jax.lax.dot_general(ky, u.reshape(W, H * C),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(u.dtype)
        at = jnp.swapaxes(a.reshape(W, H, C), 0, 1).reshape(H, W * C)
        bb = jnp.dot(kx, at, preferred_element_type=jnp.float32)
        b2 = bb.astype(u.dtype).reshape(H * W, C)
    t = jnp.dot(b2, m_ref[0, 0],
                preferred_element_type=jnp.float32)  # [(i l), o]

    @pl.when(jn == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += t

    @pl.when(jn == N - 1)
    def _():
        o_ref[0] = (acc_ref[...] - bias_ref[0]).astype(o_ref.dtype)


def apply_pass(u_t, kx, ky, m, bias, mode):
    return pl.pallas_call(
        functools.partial(_apply_kernel, mode=mode),
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, W, H, C), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, H), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H * W, C), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), DT),
        scratch_shapes=[pltpu.VMEM((H * W, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(u_t, kx, ky, m, bias)


# ---------------------------------------------------------------------------
# XLA reference for the same portions (the blkK core's apply pair + Gram)
# ---------------------------------------------------------------------------

def xla_stats(u, kx, ky):
    a = jnp.einsum("bnlw,bhwc->bnhlc", ky, u)
    bb = jnp.einsum("bnih,bnhlc->bnilc", kx, a)
    g = jnp.einsum("bnilc,bnile->bnce", bb, bb,
                   preferred_element_type=jnp.float32)
    s = jnp.einsum("bnilc->bnc", bb.astype(jnp.float32))
    return g, s


def xla_full(u, kx, ky, m, bias):
    a = jnp.einsum("bnlw,bhwc->bnhlc", ky, u)
    bb = jnp.einsum("bnih,bnhlc->bnilc", kx, a)
    g = jnp.einsum("bnilc,bnile->bnce", bb, bb,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bnilc,bnco->bilo", bb, m)
    return out - bias[:, None, None, :], g


def main():
    log(f"devices: {jax.devices()}")
    log("== piece probes ==")
    run_pieces()

    u = mk(0, (B, H, W, C))
    u_t = jnp.swapaxes(u, 1, 2)               # [b, w, h, c]
    kx = mk(1, (B, N, H, H), 1 / H)
    ky = mk(2, (B, N, W, W), 1 / W)
    m = mk(3, (B, N, C, C), 1 / C)
    bias = mk(4, (B, C))

    log("== stats pass ==")
    g_ref, s_ref = jax.jit(xla_stats)(u, kx, ky)
    g_ref, s_ref = np.asarray(g_ref), np.asarray(s_ref)
    for mode in ("rank3", "swap"):
        try:
            g, s = jax.jit(functools.partial(stats_pass, mode=mode))(u_t, kx, ky)
            ge = np.max(np.abs(np.asarray(g) - g_ref)) / (np.abs(g_ref).max() + 1e-9)
            se = np.max(np.abs(np.asarray(s)[:, :, 0] - s_ref)) / (np.abs(s_ref).max() + 1e-9)
            t = timed(lambda ut, a, b: stats_pass(ut, a, b, mode)[0],
                      (u_t, kx, ky))
            log(f"  stats[{mode}]: rel-err g={ge:.2e} s={se:.2e}  {t*1e3:.2f} ms")
        except Exception as e:
            log(f"  stats[{mode}]: {type(e).__name__}: {str(e).splitlines()[0][:140]}")

    log("== apply pass ==")
    out_ref, _ = jax.jit(xla_full)(u, kx, ky, m, bias)
    out_ref = np.asarray(out_ref, np.float32)  # [b, i, l, o]
    for mode in ("rank3", "swap"):
        try:
            o = jax.jit(functools.partial(apply_pass, mode=mode))(
                u_t, kx, ky, m, bias)
            o3 = np.asarray(o, np.float32).reshape(B, H, W, C)
            err = np.max(np.abs(o3 - out_ref)) / (np.abs(out_ref).max() + 1e-9)
            t = timed(lambda ut, a, b, mm, bs: apply_pass(ut, a, b, mm, bs, mode),
                      (u_t, kx, ky, m, bias))
            log(f"  apply[{mode}]: rel-err {err:.2e}  {t*1e3:.2f} ms")
        except Exception as e:
            log(f"  apply[{mode}]: {type(e).__name__}: {str(e).splitlines()[0][:140]}")

    log("== XLA reference timings (same portions) ==")
    t = timed(lambda a, b, c: xla_stats(a, b, c)[0], (u, kx, ky))
    log(f"  xla stats-pass equivalent: {t*1e3:.2f} ms")
    t = timed(lambda a, b, c, mm, bs: xla_full(a, b, c, mm, bs)[0],
              (u, kx, ky, m, bias))
    log(f"  xla full equivalent (shares bb between gram+out): {t*1e3:.2f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
