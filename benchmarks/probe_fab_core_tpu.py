"""On-chip timing for the two-pass Pallas FAB core (fab_core.py) vs the XLA
_batched_gram_core, at the decode bench shapes.

Run one variant/shape per invocation (a pathological Mosaic compile on this
stack's remote-compile service blocks the queue for everyone; keep blast
radius small):

    python benchmarks/probe_fab_core_tpu.py --shape ns2d --variant a4
    python benchmarks/probe_fab_core_tpu.py --shape sw --variant a4 --block 4
    python benchmarks/probe_fab_core_tpu.py --shape ns2d --xla-only

A health gate (fresh unique-shape XLA compile must return inside
--health-timeout) aborts early while the service queue is still draining.
"""

import argparse
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


SHAPES = {
    "ns2d": (116, 8, 32, 32, 64),
    "ns2d58": (58, 8, 32, 32, 64),
    "sw": (336, 8, 48, 96, 64),
    "sw84": (84, 8, 48, 96, 64),
}


def health_gate(timeout_s: float):
    """Fresh, unique XLA compile must come back fast or we abort."""
    import threading

    n = int(time.time()) % 971 + 131
    done = []

    def work():
        x = jnp.ones((n, n + 3), jnp.float32)
        float(jnp.sum(jnp.tanh(x @ x.T)))
        done.append(True)

    t = threading.Thread(target=work, daemon=True)
    t0 = time.time()
    t.start()
    t.join(timeout_s)
    if not done:
        log(f"health gate FAILED: fresh XLA compile still pending after "
            f"{timeout_s:.0f}s — compile service queue not drained; aborting")
        sys.exit(3)
    log(f"health gate ok ({time.time() - t0:.1f}s)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="ns2d", choices=sorted(SHAPES))
    p.add_argument("--variant", default="a4", choices=["a4", "a3"])
    p.add_argument("--block", type=int, default=0)
    p.add_argument("--xla-only", action="store_true")
    p.add_argument("--health-timeout", type=float, default=120.0)
    args = p.parse_args()

    log(f"devices: {jax.devices()}")
    health_gate(args.health_timeout)

    B, N, H, W, C = SHAPES[args.shape]
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dt = jnp.bfloat16
    u = jax.random.normal(ks[0], (B, H, W, C)).astype(dt)
    kx = (jax.random.normal(ks[1], (B, N, H, H)) / H).astype(dt)
    ky = (jax.random.normal(ks[2], (B, N, W, W)) / W).astype(dt)
    w_in = (jax.random.normal(ks[3], (C, N, C)) / np.sqrt(C)).astype(jnp.float32)
    w_o1 = (jax.random.normal(ks[4], (N, C, C)) / np.sqrt(C)).astype(jnp.float32)

    from lns_tpu.ops.factorized_attention import FABlock2D

    xla_core = jax.jit(FABlock2D._batched_gram_core)
    ref = np.asarray(jax.jit(FABlock2D._batched_gram_core)(
        u, kx, ky, w_in, w_o1), np.float32)
    t = timed(lambda a, b, c: xla_core(a, b, c, w_in, w_o1), (u, kx, ky))
    log(f"XLA _batched_gram_core [{args.shape}]: {t*1e3:.2f} ms")
    if args.xla_only:
        return

    from lns_tpu.pallas_kernels.fab_core import fab_fused_core

    fn = jax.jit(lambda a, b, c: fab_fused_core(
        a, b, c, w_in, w_o1, block_b=args.block))
    t0 = time.time()
    out = np.asarray(fn(u, kx, ky), np.float32)
    log(f"fused[bs={args.block or 'auto'}] compiled+ran "
        f"in {time.time()-t0:.1f}s")
    err = np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9)
    log(f"fused rel-err vs XLA core: {err:.2e}")
    t = timed(lambda a, b, c: fn(a, b, c), (u, kx, ky))
    log(f"fused[bs={args.block or 'auto'}, "
        f"{args.shape}]: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
