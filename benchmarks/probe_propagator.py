"""Latent-propagator scan cost probe (round 3).

The NS2d fused rollout runs 29 sequential SimpleCNN steps on a tiny
[b, 8, 8, 16] latent (reference propagator: train_stage2_ns2d.py:25-87).
Each step is ~25 small ops (9 wrap-padded 3x3 convs at 8x8x128, 8 1x1s,
7 norm passes), so the scan's cost is dominated by per-op overheads, not
FLOPs. This probe measures:

  1. `latents`: LatentDynamics.predict_latents (encode + 29-step scan,
     to_x=False) — the rollout's real non-decode cost.
  2. `scan/conv`: a hand-rolled SimpleCNN-shaped 29-step scan using
     lax.conv_general_dilated for the 3x3s (the ConvND lowering).
  3. `scan/im2col`: the same math with every wrap-padded 3x3 expressed as
     roll-concat im2col + ONE [b*64, 9c] x [9c, c] GEMM — fewer, bigger
     MXU ops per step.

  python benchmarks/probe_propagator.py   [PROP_BATCH=32]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

os.makedirs("/root/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax

C_IN, C, NB, STEPS = 16, 128, 3, 29
DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def make_params(key, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 64)
    i = iter(range(64))

    def w(shape, scale):
        return (jax.random.normal(ks[next(i)], shape) * scale).astype(dtype)

    p = {"in": w((C_IN, C), C_IN**-0.5), "out": w((C, C_IN), C**-0.5)}
    for b in range(NB):
        p[f"b{b}"] = {
            "c1": w((3, 3, C, C), (9 * C) ** -0.5),
            "c2": w((3, 3, C, C), (9 * C) ** -0.5),
            "c3": w((3, 3, C, C), (9 * C) ** -0.5),
            "f1": w((C, C), C**-0.5),
            "f2": w((C, C), C**-0.5),
        }
    return p


def _ln(x, eps=1e-5):
    # GroupNorm(1) == per-sample layer norm over (h, w, c)
    m = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
    v = jnp.mean(jnp.square(x.astype(jnp.float32) - m), axis=(1, 2, 3),
                 keepdims=True)
    return ((x - m) * lax.rsqrt(v + eps)).astype(x.dtype)


def conv3_wrap_conv(x, k, dil):
    xp = jnp.concatenate([x[:, -dil:], x, x[:, :dil]], axis=1)
    xp = jnp.concatenate([xp[:, :, -dil:], xp, xp[:, :, :dil]], axis=2)
    return lax.conv_general_dilated(xp, k, (1, 1), [(0, 0), (0, 0)],
                                    rhs_dilation=(dil, dil),
                                    dimension_numbers=DN)


def conv3_wrap_im2col(x, k, dil):
    b, h, w_, c = x.shape
    cols = []
    for dy in (-dil, 0, dil):
        for dx in (-dil, 0, dil):
            cols.append(jnp.roll(x, (-dy, -dx), axis=(1, 2)))
    patches = jnp.concatenate(cols, axis=-1)           # [b, h, w, 9c]
    kmat = k.reshape(9 * c, k.shape[-1])               # [9c, co]
    return jnp.einsum("bhwk,ko->bhwo", patches, kmat)


def make_step(conv3):
    def step(z, p):
        h = jnp.einsum("bhwc,co->bhwo", z, p["in"])
        for bi in range(NB):
            bp = p[f"b{bi}"]
            t = _ln(h)
            t = jax.nn.gelu(conv3(t, bp["c1"], 1))
            t = jax.nn.gelu(conv3(t, bp["c2"], 2))
            t = conv3(t, bp["c3"], 1)
            h = h + t
            f = _ln(h)
            f = jax.nn.gelu(jnp.einsum("bhwc,co->bhwo", f, bp["f1"]))
            h = h + jnp.einsum("bhwc,co->bhwo", f, bp["f2"])
        return jnp.einsum("bhwc,co->bhwo", _ln(h), p["out"])

    return step


def timed(fn, args, n=24):
    c = jax.jit(fn)
    t0 = time.time()
    r = np.asarray(c(*args))
    compile_s = time.time() - t0
    best1 = bestn = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(1 + n):
            out = c(*args)
        np.asarray(out)
        bestn = min(bestn, time.perf_counter() - t0)
    return (bestn - best1) / n, compile_s, r


def main():
    b = int(os.environ.get("PROP_BATCH", "32"))
    print(f"devices: {jax.devices()}  batch={b}", flush=True)
    p = make_params(jax.random.key(0))
    z0 = jax.random.normal(jax.random.key(1), (b, 8, 8, C_IN)).astype(
        jnp.bfloat16)

    if os.environ.get("PROP_SKIP_MODEL"):
        _bench_hand_paths(z0, p)
        return
    # real model path: encode + scan, no decode
    from lns_tpu.models import LatentDynamics
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(HERE), "__graft_entry__.py"))
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    cfg = graft._ns2d_cfg()
    model = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]
    t, cs, _ = timed(
        lambda pp, xx: model.predict(pp, xx, steps=STEPS, to_x=False)[:, -1].sum(),
        (params, x))
    print(f"latents (encode+scan, real model): {t*1e3:7.2f} ms (c {cs:.0f}s)",
          flush=True)

    _bench_hand_paths(z0, p)


def _bench_hand_paths(z0, p):
    ref = None
    for name, conv3 in (("conv", conv3_wrap_conv),
                        ("im2col", conv3_wrap_im2col)):
        step = make_step(conv3)

        def rollout(z, p):
            def body(carry, _):
                zn = step(carry, p)
                return zn, ()

            zout, _ = lax.scan(body, z, None, length=STEPS)
            return zout.astype(jnp.float32).sum()

        t, cs, r = timed(rollout, (z0, p))
        if ref is None:
            ref, err = r, 0.0
        else:
            err = abs(float(r - ref)) / (abs(float(ref)) + 1e-9)
        print(f"scan/{name:7s}: {t*1e3:7.2f} ms (err {err:.1e}, c {cs:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
