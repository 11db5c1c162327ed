"""Upsample(nearest 2x)+conv3x3 formulation shootout (round 3).

The decode tail's UpSampleBlocks and final resize+head-conv materialize a
4x-size nearest-upsampled activation and then run a 3x3 conv over it
(reference op being reformulated: modules/basics.py:279-299 Upsample2D).
Two TPU-native alternatives avoid the big intermediate:

  up_conv_transpose: nearest-2x + conv3x3(K)  ==  conv_transpose with
      kernel K (*) box2 (4x4, stride 2) — one op, XLA's TPU emitter
      handles the input dilation internally.
  up_phase: explicit sub-pixel decomposition — each of the 4 output
      phases (a,b in {0,1}) is a 2x2-tap conv on the SMALL grid (4/9 of
      the naive flops, 1/4 the input reads), assembled by an interleave
      reshape.

This probe measures all three at the decode-dominant shapes with the
chained difference protocol and checks exact agreement.

    FAB_SHAPES="928,32,32,64;336,48,96,64" python benchmarks/probe_upsample.py
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

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def up_naive(x, k):
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


def up_conv_transpose(x, k):
    # nearest-2x + conv(K) == input-dilated conv with kernel K (*) box2:
    # per axis K4 = [K0, K0+K1, K1+K2, K2] (K4 = conv(K, ones(2))), applied
    # to the 2x zero-stuffed input with pad (2, 2).
    k4 = jnp.zeros((4, 4) + k.shape[2:], k.dtype)
    for dp in range(2):
        for dq in range(2):
            k4 = k4.at[dp:dp + 3, dq:dq + 3].add(k)
    return lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=DN)


def up_phase(x, k):
    # phase (a, b): y[2i+a, 2j+b] = 2x2-tap conv of x with kernel K_ab
    # rows: a=0 -> {i-1: K[0], i: K[1]+K[2]}, a=1 -> {i: K[0]+K[1], i+1: K[2]}
    b_, H, W, c = x.shape
    outs = []
    for a in (0, 1):
        for bb in (0, 1):
            if a == 0:
                kr0, kr1 = k[0:1], k[1:2] + k[2:3]
                rpad = (1, 0)
            else:
                kr0, kr1 = k[0:1] + k[1:2], k[2:3]
                rpad = (0, 1)
            krows = jnp.concatenate([kr0, kr1], axis=0)  # [2,3,i,o]
            if bb == 0:
                k2 = jnp.concatenate(
                    [krows[:, 0:1], krows[:, 1:2] + krows[:, 2:3]], axis=1)
                cpad = (1, 0)
            else:
                k2 = jnp.concatenate(
                    [krows[:, 0:1] + krows[:, 1:2], krows[:, 2:3]], axis=1)
                cpad = (0, 1)
            y = lax.conv_general_dilated(x, k2, (1, 1), [rpad, cpad],
                                         dimension_numbers=DN)
            outs.append(y)
    o = outs[0].shape[-1]
    y = jnp.stack(outs, axis=0).reshape(2, 2, b_, H, W, o)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b_, 2 * H, 2 * W, o)
    return y


def timed(fn, args, n=24):
    c = jax.jit(fn)
    t0 = time.time()
    r = c(*args)
    np.asarray(r[0, 0, 0, 0])
    compile_s = time.time() - t0
    best1 = bestn = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c(*args)[0, 0, 0, 0])
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(1 + n):
            out = c(*args)
        np.asarray(out[0, 0, 0, 0])
        bestn = min(bestn, time.perf_counter() - t0)
    return (bestn - best1) / n, compile_s, r


def main():
    shapes = os.environ.get(
        "UP_SHAPES", "928,32,32,64;336,48,96,64").split(";")
    print(f"devices: {jax.devices()}", flush=True)
    for spec in shapes:
        b, h, w, c = (int(v) for v in spec.split(","))
        ks = jax.random.split(jax.random.key(0), 2)
        x = jax.random.normal(ks[0], (b, h, w, c)).astype(jnp.bfloat16)
        k = (jax.random.normal(ks[1], (3, 3, c, c)) / (3 * c**0.5)).astype(
            jnp.bfloat16)
        ref = None
        line = f"[{b},{h}x{w},c{c}]"
        for fn in (up_naive, up_conv_transpose, up_phase):
            t, cs, r = timed(fn, (x, k))
            if ref is None:
                ref = np.asarray(r, np.float32)
                err = 0.0
            else:
                a = np.asarray(r, np.float32)
                err = float(np.max(np.abs(a - ref)) /
                            (np.max(np.abs(ref)) + 1e-9))
            line += f" | {fn.__name__} {t*1e3:7.2f} ms (err {err:.1e}, c {cs:.0f}s)"
            print(line, flush=True)


if __name__ == "__main__":
    main()
