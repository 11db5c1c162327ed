"""Per-op roofline lower bound for the NS2d fused rollout / decode
(VERDICT round 2 item 1: turn "resisted reformulation" into a proof).

Walks the optimized post-fusion HLO of the benchmark program and builds a
bytes/FLOPs ledger: every entry-computation instruction is charged its
HBM-visible bytes (operands + output; fusion internals are VMEM-resident)
and its MXU FLOPs (dots/convolutions inside the fusion, attributed to the
caller). The lower bound is

    T_min = sum_i max(bytes_i / BW_eff, flops_i / PEAK)

with BW_eff the *measured* XLA elementwise bandwidth on this stack
(671 GB/s, probe_pallas_bw.py) and PEAK the measured sustained matmul rate
(191 TF/s bf16, bench.py calibration). An op that is neither bandwidth-
nor MXU-bound (latency-bound small op) is under-charged, so T_min is a
true lower bound.

    python benchmarks/roofline_decode.py [--what decode|rollout|fab]

Writes benchmarks/results_roofline.json.
"""

import argparse
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

import jax.numpy as jnp
import numpy as np

BW_EFF = 671e9     # measured XLA elementwise r+w GB/s on this stack
PEAK_BF16 = 191e12  # measured sustained chained-matmul rate (97% of peak)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "c64": 8, "s64": 8, "u64": 8,
               "s16": 2, "u16": 2}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
NAME_RE = re.compile(r"%([\w.\-]+)")


def shape_bytes(shape_str):
    """Total bytes of a shape string 'bf16[a,b,c]' or tuple '(s1, s2)'."""
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES.get(dt, 4)
    return total


def parse_hlo(hlo: str):
    """Returns (entry_ops, name2shape, comp_of, dots) where entry_ops is a
    list of (name, opcode, shape_str, operand_names) for the ENTRY
    computation, and dots is a list of (comp_name, flops)."""
    name2shape = {}
    comp_of = {}
    entry_ops = []
    dots = []
    cur_comp = None
    in_entry = False
    for raw in hlo.splitlines():
        line = raw.strip()
        m = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->.*{$", line)
        if m:
            cur_comp = m.group(2)
            in_entry = bool(m.group(1))
            continue
        if line == "}":
            continue
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\))|(?:[\w\[\],]+(?:\{[^}]*\})?))\s*([\w\-]+)\((.*)$", line)
        if not m:
            continue
        name, shape_str, opcode, rest = m.groups()
        name2shape[name] = shape_str
        comp_of[name] = cur_comp
        operands = []
        depth = 0
        arg_str = ""
        for ch in rest:
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            arg_str += ch
        operands = NAME_RE.findall(arg_str)
        if in_entry:
            entry_ops.append((name, opcode, shape_str, operands))
        if opcode in ("dot", "convolution"):
            flops = dot_flops(line, shape_str, operands, name2shape)
            dots.append((cur_comp, flops, name))
    return entry_ops, name2shape, comp_of, dots


def dot_flops(line, out_shape_str, operands, name2shape):
    """2 * prod(out dims) * K; K from lhs shape + contracting dims."""
    out_elems = 0
    for dt, dims in SHAPE_RE.findall(out_shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out_elems = n
        break
    if not operands:
        return 0
    lhs_shape = name2shape.get(operands[0], "")
    m = SHAPE_RE.search(lhs_shape)
    if not m:
        return 0
    lhs_dims = [int(d) for d in m.group(2).split(",") if d]
    cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    k = 1
    if cm:
        for i in cm.group(1).split(","):
            if i and int(i) < len(lhs_dims):
                k *= lhs_dims[int(i)]
    else:
        # convolution: flops = 2 * out_elems * (kernel spatial * in_ch)
        rhs_shape = name2shape.get(operands[1], "") if len(operands) > 1 else ""
        rm = SHAPE_RE.search(rhs_shape)
        if rm:
            rdims = [int(d) for d in rm.group(2).split(",") if d]
            # kernel elems / out_features: approximate K = prod(rhs)/out_feat
            # use dim_labels to be exact is overkill; prod(rhs dims)/largest
            k = int(np.prod(rdims) / max(rdims)) if rdims else 1
    return 2 * out_elems * k


def ledger(fn, args, label, top=20):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    entry_ops, name2shape, comp_of, dots = parse_hlo(hlo)

    # attribute dot flops: direct entry dots by instruction name, dots
    # inside fused computations by their computation (summed), looked up
    # through the entry op's calls= attribute
    flops_by_comp = {}
    flops_by_instr = {}
    for comp, fl, iname in dots:
        flops_by_comp[comp] = flops_by_comp.get(comp, 0) + fl
        flops_by_instr[iname] = flops_by_instr.get(iname, 0) + fl

    # map fused computation name -> entry instruction via 'calls=' attr
    # NOTE on FLOPs: XLA lowers many batched dots to dilated-convolution
    # encodings whose per-op FLOPs can't be read off the instruction text,
    # so the per-op ledger charges BYTES only (every operand/output byte
    # must cross HBM), and the MXU term uses the compiler's own
    # cost_analysis() total. T_min = max(sum bytes / BW, total_flops /
    # PEAK) — a valid lower bound for the compiled graph under perfect
    # overlap of memory and MXU.
    rows = []
    total_bytes = 0
    copy_bytes = 0
    for name, opcode, shape_str, operands in entry_ops:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        b = shape_bytes(shape_str)
        for op in operands:
            if op in name2shape:
                b += shape_bytes(name2shape[op])
        total_bytes += b
        if opcode in ("copy", "transpose"):
            copy_bytes += b
        rows.append({"op": name[:60], "opcode": opcode, "bytes": b,
                     "t_us": round(b / BW_EFF * 1e6, 1)})
    rows.sort(key=lambda r: -r["t_us"])
    try:
        ca = compiled.cost_analysis()
        ca_flops = ca.get("flops") if isinstance(ca, dict) else None
    except Exception:
        ca_flops = None
    t_bw = total_bytes / BW_EFF
    t_mx = (ca_flops or 0) / PEAK_BF16
    out = {
        "label": label,
        "t_min_ms": round(max(t_bw, t_mx) * 1e3, 2),
        "t_bw_ms": round(t_bw * 1e3, 2),
        "t_mxu_ms": round(t_mx * 1e3, 2),
        "total_gb": round(total_bytes / 1e9, 3),
        "copy_transpose_gb": round(copy_bytes / 1e9, 3),
        "cost_analysis_gflops": round(ca_flops / 1e9, 1) if ca_flops else None,
        "bw_eff_gbps": BW_EFF / 1e9,
        "peak_tflops": PEAK_BF16 / 1e12,
        "top_ops": rows[:top],
        "n_entry_ops": len(rows),
    }
    return out


def build_decode(batch=928):
    from benchmarks.run_benchmarks import ns2d_cfg
    from lns_tpu.models import LatentDynamics

    cfg = ns2d_cfg()
    model = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jnp.zeros((32, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]
    z = jnp.zeros((batch, 8, 8, 16), jnp.bfloat16)
    return (lambda p, z: model.decode(p, z)), (params, z)


def build_rollout(batch=32, steps=29):
    from benchmarks.run_benchmarks import ns2d_cfg
    from lns_tpu.models import LatentDynamics

    cfg = ns2d_cfg()
    model = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]
    return (lambda p, x: model.predict(p, x, steps=steps, to_x=True)), (params, x)


def build_sw_decode(batch=336):
    """SW decoder at the rollout bench shape (batch 8 x 42 steps)."""
    from benchmarks.run_benchmarks import sw_cfg
    from lns_tpu.models import LatentDynamics

    cfg = sw_cfg()
    model = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jnp.zeros((8, 96, 192, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]
    z = jnp.zeros((batch, 12, 24, 64), jnp.bfloat16)
    return (lambda p, z: model.decode(p, z)), (params, z)


def build_sw_rollout(batch=8, steps=42):
    from benchmarks.run_benchmarks import sw_cfg
    from lns_tpu.models import LatentDynamics

    cfg = sw_cfg()
    model = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 96, 192, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]
    return (lambda p, x: model.predict(p, x, steps=steps, to_x=True)), (params, x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="decode,rollout")
    p.add_argument("--out", default=os.path.join(HERE, "results_roofline.json"))
    args = p.parse_args()

    results = {}
    for what in args.what.split(","):
        fn, fargs = {"decode": build_decode, "rollout": build_rollout,
                     "sw_decode": build_sw_decode,
                     "sw_rollout": build_sw_rollout}[what]()
        res = ledger(fn, fargs, what)
        results[what] = res
        print(json.dumps({k: v for k, v in res.items() if k != "top_ops"},
                         indent=2), flush=True)
        for r in res["top_ops"][:12]:
            print(f"  {r['t_us']:>8.1f} us  {r['bytes']/2**20:8.1f} MiB  "
                  f"{r['opcode']:12} {r['op']}", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
