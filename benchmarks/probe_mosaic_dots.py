"""Which rank-3 dot_general orientations does Mosaic actually compile on
this stack? (round 5 — the fab_core two-pass kernel assembles from these.)

Each candidate is compiled in its own tiny pallas_call, one at a time, with
failures caught (they return fast HTTP 500s, they don't wedge the service).
Shapes are the NS2d FAB tile: c=64 channels, h=w=32 spatial, heads folded
into the grid. Output: ok/FAIL per orientation + wall time for the ok ones.

Run: python benchmarks/probe_mosaic_dots.py
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


C, H, W, L, I = 64, 32, 32, 32, 32


def _dg(a, b, dims, dtype=None):
    out = jax.lax.dot_general(a, b, (dims, ((), ())),
                              preferred_element_type=jnp.float32)
    return out if dtype is None else out.astype(dtype)


# Each case: (name, out_shape, kernel_body(refs...))
# Inputs available to every kernel: u [C,H,W], k2 [L,W], k3 [I,H],
# a3 [C,H,L] (precomputed a3-style half-apply), q [L,C,I], m [C,C].
def k_rhs_minor(u, k2, k3, a3, q, m, o):
    # rank2 x rank3, contract rhs-MINOR: [L,W].[C,H,W] -> [L,C,H]
    o[...] = _dg(k2[...], u[...], ((1,), (2,)), o.dtype)


def k_lhs_minor(u, k2, k3, a3, q, m, o):
    # rank3 lhs-minor x rank2: [C,H,W].[L,W] -> [C,H,L]
    o[...] = _dg(u[...], k2[...], ((2,), (1,)), o.dtype)


def k_lhs_interior(u, k2, k3, a3, q, m, o):
    # rank3 lhs-INTERIOR x rank2: [C,H,L].[I,H] -> [C,L,I]
    o[...] = _dg(a3[...], k3[...], ((1,), (1,)), o.dtype)


def k_rhs_interior(u, k2, k3, a3, q, m, o):
    # rank2 x rank3 rhs-INTERIOR: [I,H].[C,H,L] -> [I,C,L]
    o[...] = _dg(k3[...], a3[...], ((1,), (1,)), o.dtype)


def k_gram_batched(u, k2, k3, a3, q, m, o):
    # batched A@A^T: [L,C,I] x [L,C,I] batch L contract I -> [L,C,C]
    o[...] = jax.lax.dot_general(q[...], q[...], (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)


def k_gram_batched_sum(u, k2, k3, a3, q, m, o):
    # the full Gram: batched A@A^T then reduce batch -> [C,C]
    gb = jax.lax.dot_general(q[...], q[...], (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o[...] = jnp.sum(gb, axis=0)


def k_phi_interior(u, k2, k3, a3, q, m, o):
    # q [I,C,L] . m [C,O] contract lhs-INTERIOR/rhs-major -> [I,L,O]
    # (the phi projection AND the apply pass's folded c->o contraction)
    o[...] = _dg(q[...], m[...], ((1,), (0,)), o.dtype)


def k_phi_moments(u, k2, k3, a3, q, m, o):
    # full Gram-free stats chain: phi tile + mean / E[x^2] reductions
    phi = _dg(q[...], m[...], ((1,), (0,)), q.dtype)      # [I,L,O]
    s1 = jnp.sum(jnp.sum(phi, axis=1, keepdims=True, dtype=jnp.float32),
                 axis=0, keepdims=True)                   # [1,1,O]
    s2 = jnp.sum(jnp.sum(phi * phi, axis=1, keepdims=True,
                         dtype=jnp.float32), axis=0, keepdims=True)
    o[...] = jnp.concatenate([s1[0], s2[0]], axis=0)      # [2,O]


def k_phi_f32out(u, k2, k3, a3, q, m, o):
    # same lhs-interior dot, f32 result written with NO cast
    o[...] = jax.lax.dot_general(q[...], m[...], ((((1,), (0,)), ((), ()))),
                                 preferred_element_type=jnp.float32)


def k_apply_chain(u, k2, k3, a3, q, m, o, acc):
    # full apply-pass chain: S1 + S2 + interior proj, f32 scratch
    # accumulate, cast-on-final-write (what _apply_kernel does)
    dt = u.dtype
    a = _dg(u[...], k2[...], ((2,), (1,)), dt)       # [C,H,L]
    bb = _dg(k3[...], a, ((1,), (1,)), dt)           # [I,C,L]
    t = jax.lax.dot_general(bb, m[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [I,L,O]
    acc[...] = t
    acc[...] += t
    o[...] = acc[...].astype(o.dtype)


def k_projfirst(u, k2, k3, a3, q, m, o):
    # proj-FIRST: m [C,O] . u [C,H,W] contract major/major -> [O,H,W]
    o[...] = _dg(m[...], u[...], ((0,), (0,)), o.dtype)


def k_chain_projfirst(u, k2, k3, a3, q, m, o, acc):
    # full proj-first apply chain: proj0 -> S1 -> S2 -> f32 acc -> write
    dt = u.dtype
    v = _dg(m[...], u[...], ((0,), (0,)), dt)        # [O,H,W]
    a = _dg(v, k2[...], ((2,), (1,)), dt)            # [O,H,L]
    t = jax.lax.dot_general(k3[...], a, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [I,O,L]
    acc[...] = t
    acc[...] += t
    o[...] = acc[...]


def k_chain_moments(u, k2, k3, a3, q, m, o):
    # full proj-first stats chain: proj0 -> S1 -> S2 -> moments [2,O]
    dt = u.dtype
    v = _dg(m[...], u[...], ((0,), (0,)), dt)        # [O,H,W]
    a = _dg(v, k2[...], ((2,), (1,)), dt)            # [O,H,L]
    phi = _dg(k3[...], a, ((1,), (1,)), dt)          # [I,O,L]
    s1 = jnp.sum(jnp.sum(phi, axis=2, keepdims=True, dtype=jnp.float32),
                 axis=0, keepdims=True)              # [1,O,1]
    s2 = jnp.sum(jnp.sum(phi * phi, axis=2, keepdims=True,
                         dtype=jnp.float32), axis=0, keepdims=True)
    o[...] = jnp.concatenate([s1[0], s2[0]], axis=1)    # [O,2]


def k_scr_bf16(u, k2, k3, a3, q, m, o, acc):
    # chain with bb handed off through a BF16 scratch, dot emitting bf16
    # natively (preferred_element_type) so no separate cast-on-write op
    dt = u.dtype
    a = _dg(u[...], k2[...], ((2,), (1,)), dt)       # [C,H,L]
    acc[...] = jax.lax.dot_general(k3[...], a, (((1,), (1,)), ((), ())),
                                   preferred_element_type=dt)  # [I,C,L]
    bb = acc[...]
    o[...] = jax.lax.dot_general(bb, m[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


def k_scr_f32(u, k2, k3, a3, q, m, o, acc):
    # chain with bb handed off through an F32 scratch, consumers in f32
    dt = u.dtype
    a = _dg(u[...], k2[...], ((2,), (1,)), dt)       # [C,H,L]
    acc[...] = jax.lax.dot_general(k3[...], a, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    bb = acc[...]
    mf = m[...].astype(jnp.float32)
    o[...] = jax.lax.dot_general(bb, mf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


def k_chain_scr2(u, k2, k3, a3, q, m, o, acc, a_scr, bb_scr):
    # FULL fused-FAB chain for one (sample, head), every rank-3 dot result
    # handed to the next dot through a VMEM scratch ref (dot-produced
    # rank-3 operands force unsupported relayout reshapes; ref loads are
    # free to materialize in whatever layout the consumer wants). All-f32.
    uf = u[...].astype(jnp.float32)
    k2f = k2[...].astype(jnp.float32)
    k3f = k3[...].astype(jnp.float32)
    a_scr[...] = jax.lax.dot_general(uf, k2f, (((2,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    bb_scr[...] = jax.lax.dot_general(k3f, a_scr[...],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    bb = bb_scr[...]                                  # [I,C,L] f32, ref
    wf = m[...].astype(jnp.float32)                   # [C,D]
    phi = jax.lax.dot_general(bb, wf, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [I,L,D]
    s1 = jnp.sum(jnp.sum(phi, axis=1, keepdims=True), axis=0,
                 keepdims=True)                       # [1,1,D]
    s2 = jnp.sum(jnp.sum(phi * phi, axis=1, keepdims=True), axis=0,
                 keepdims=True)
    n_px = phi.shape[0] * phi.shape[1]
    mean = s1[0] / n_px                               # [1,D]
    var = jnp.maximum(s2[0] / n_px - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    mm = jax.lax.dot_general(wf * inv, wf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [C,C]
    bias = jax.lax.dot_general(mean * inv, wf, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [1,C]
    t = jax.lax.dot_general(bb, mm, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [I,L,O]
    acc[...] = t - bias[None]
    acc[...] += t
    o[...] = acc[...]


def k_scrlhsint(u, k2, k3, a3, q, m, o, acc):
    # the ONE unknown for the transpose-chain design: lhs-interior
    # contraction with a SCRATCH-ref lhs (phi_moments proved it for an
    # INPUT ref). Fill the scratch with a plain copy of the input.
    acc[...] = q[...]                                 # bf16 scratch copy
    o[...] = jax.lax.dot_general(acc[...], m[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


def k_transp_chain(u, k2, k3, a3, q, m, o, s1s, s2s):
    # transpose-chain apply pair: big input-ref-lhs-interior dot +
    # proven load-transpose-store + scratch-ref-lhs-interior dot.
    # q [32,64,32] stands in for [H,W',C']-oriented u; m [64,64] for ky.
    a = jax.lax.dot_general(q[...], m[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [32,32,64]
    s1s[...] = a
    s2s[...] = jnp.transpose(s1s[...], (1, 0, 2))      # [32,32,64]
    bb = jax.lax.dot_general(s2s[...], k2[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [32,64,32]
    o[...] = bb


def k_proj_major(u, k2, k3, a3, q, m, o):
    # a3 proj: bb [C,L,I] . m [C,O] contract lhs-MAJOR -> [L,I,O]
    o[...] = _dg(a3[...], m[...], ((0,), (0,)), o.dtype)  # [H,L,O]


CASES = {
    "rhs_minor": ("[L,W].[C,H,W]->[L,C,H]", (L, C, H), k_rhs_minor),
    "lhs_minor": ("[C,H,W].[L,W]->[C,H,L]", (C, H, L), k_lhs_minor),
    "lhs_interior": ("[C,H,L].[I,H]->[C,L,I]", (C, L, I), k_lhs_interior),
    "rhs_interior": ("[I,H].[C,H,L]->[I,C,L]", (I, C, L), k_rhs_interior),
    "gram_batched": ("[L,C,I]x2 ->[L,C,C]", (L, C, C), k_gram_batched),
    "gram_b+sum": ("[L,C,I]x2 ->[C,C]", (C, C), k_gram_batched_sum),
    "phi_interior": ("[I,C,L].[C,O]->[I,L,O]", (I, L, C), k_phi_interior),
    "phi_moments": ("[I,C,L].[C,O]->[2,O]", (2, C), k_phi_moments),
    "phi_f32out": ("[I,C,L].[C,O]->[I,L,O]f32", (I, L, C), k_phi_f32out),
    "apply_chain": ("S1+S2+proj+acc->[I,L,O]", (I, L, C), k_apply_chain),
    "projfirst": ("[C,O].[C,H,W]->[O,H,W]", (C, H, W), k_projfirst),
    "chain_projf_f32": ("proj0+S1+S2+acc->[I,O,L]f32", (I, C, L),
                        k_chain_projfirst),
    "chain_moments_f32": ("proj0+S1+S2->[O,2]f32", (C, 2), k_chain_moments),
    "proj_major": ("[C,H,L].[C,O]->[H,L,O]", (H, L, C), k_proj_major),
    "scr_bf16_f32": ("S1+S2->bf16 scr->proj f32", (I, L, C), k_scr_bf16),
    "scr_f32_f32": ("S1+S2->f32 scr->proj f32", (I, L, C), k_scr_f32),
    "chain_scr2_f32": ("full FAB chain, scr handoffs", (I, L, C),
                       k_chain_scr2),
    "scrlhsint_f32": ("scratch-ref lhs-interior dot", (I, L, C),
                      k_scrlhsint),
    "transp_chain_f32": ("refint+transp-store+scrint", (I, C, L),
                         k_transp_chain),
}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cases", nargs="*", default=None,
                    help="case names to run (default: all)")
    cli = ap.parse_args()
    names = cli.cases or list(CASES)

    log(f"devices: {jax.devices()}")
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    dt = jnp.bfloat16
    u = jax.random.normal(ks[0], (C, H, W)).astype(dt)
    k2 = jax.random.normal(ks[1], (L, W)).astype(dt)
    k3 = jax.random.normal(ks[2], (I, H)).astype(dt)
    a3 = jax.random.normal(ks[3], (C, H, L)).astype(dt)
    q = jax.random.normal(ks[4], (L, C, I)).astype(dt)
    m = jax.random.normal(ks[5], (C, C)).astype(dt)
    args = (u, k2, k3, a3, q, m)

    for name in names:
        desc, oshape, body = CASES[name]
        name = f"{name:13s}{desc}"
        odt = (jnp.float32 if "gram" in name or "moments" in name
               or "f32" in name else dt)
        log(f"compiling {name} ...")

        def kern(*refs):
            body(*refs)

        if "transp_chain" in name:
            scratch = [pltpu.VMEM((L, I, C), jnp.float32),
                       pltpu.VMEM((I, L, C), jnp.float32)]
        elif "scrlhsint" in name:
            scratch = [pltpu.VMEM((I, C, L), jnp.bfloat16)]
        elif "scr2" in name:
            scratch = [pltpu.VMEM(oshape, jnp.float32),
                       pltpu.VMEM((C, H, L), jnp.float32),
                       pltpu.VMEM((I, C, L), jnp.float32)]
        elif "scr" in name:
            sdt = jnp.bfloat16 if "bf16" in name else jnp.float32
            scratch = [pltpu.VMEM((I, C, L), sdt)]
        elif "acc" in body.__code__.co_varnames:
            scratch = [pltpu.VMEM(oshape, jnp.float32)]
        else:
            scratch = []
        try:
            f = pl.pallas_call(
                kern,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(oshape, odt),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 2**20),
            )
            t0 = time.time()
            r = np.asarray(jax.jit(f)(*args))
            log(f"ok   {name}  ({time.time()-t0:.1f}s, |out|={np.abs(r).mean():.3f})")
        except Exception as e:
            s = str(e)
            keep = [ln for ln in s.split("\n") if ln.strip()
                    and ("vector<" in ln or "Not implemented" in ln
                         or "infer-vector" in ln or "failed to compile" in ln)][:5]
            if not keep:
                keep = [ln for ln in s.split("\n") if ln.strip()][:3]
            log(f"FAIL {name}  " + " | ".join(ln.strip()[:150] for ln in keep))


if __name__ == "__main__":
    main()
