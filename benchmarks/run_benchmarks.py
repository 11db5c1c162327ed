"""Detailed benchmark suite: rollout + train-step throughput for all three
workloads at the reference's shipped shapes.

    python benchmarks/run_benchmarks.py [--out benchmarks/results.json]

Timing uses the tunnel-safe protocol (in-program chaining + RTT
subtraction, see lns_tpu.utils.profiling.time_fn). bench.py at the repo
root remains the driver's single-line entry.
"""

import argparse
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

# persistent compile cache: env override > /root/jax_cache (this machine) >
# a tempdir fallback for machines without a writable /root
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache is None:
    _cache = "/root/jax_cache"
    try:
        os.makedirs(_cache, exist_ok=True)
    except OSError:
        _cache = os.path.join(tempfile.gettempdir(), "jax_cache")
        os.makedirs(_cache, exist_ok=True)
else:
    os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

import jax.numpy as jnp
import numpy as np


def ns2d_cfg():
    from lns_tpu.config import Config

    return Config(
        latent_dim=16, Ly=64, Lx=64, resolution=64, in_channels=1,
        latent_resolution=8, is_periodic=True,
        encoder_channels=[64, 64, 64, 128, 128], fourier_resolutions=[],
        encoder_res_blocks=1, use_attn_enc=False, use_fa=True,
        decoder_channels=[128, 128, 64, 64], attn_resolutions=[16, 32],
        decoder_res_blocks=1, final_smoothing=False, attn_heads=8, attn_dim=64,
        disable_coarse_attn=False, prop_n_block=3, prop_n_embd=128, dilation=2,
        out_tw=2, interval=1, noise_level=0.0,
    )


def sw_cfg():
    from lns_tpu.config import Config

    return Config(
        latent_dim=64, Ly=96, Lx=192, resolutions=[96, 192], in_channels=3,
        latent_resolution=12, periodic_direction="x", hw_ratio=2,
        encoder_channels=[64, 64, 64, 128, 128], fourier_resolutions=[],
        encoder_res_blocks=1, use_fa=True, decoder_channels=[128, 128, 64, 64],
        attn_resolutions=[24, 48], decoder_res_blocks=1, final_smoothing=False,
        decoder_attn_heads=8, decoder_attn_dim=64, disable_coarse_attn=False,
        prop_n_block=4, prop_n_embd=128, dilation=3, out_tw=5, noise_level=0.0,
    )


def twophase_cfg():
    from lns_tpu.config import Config

    return Config(
        latent_dim=64, Ly=61, Lx=121, resolutions=[61, 121], in_channels=4,
        latent_resolution=7, is_periodic=False, hw_ratio=2,
        encoder_channels=[64, 64, 64, 128, 128], fourier_resolutions=[],
        encoder_res_blocks=1, use_fa=True, decoder_channels=[128, 128, 64, 64],
        attn_resolutions=[15, 30], decoder_res_blocks=1, final_smoothing=False,
        decoder_attn_heads=8, decoder_attn_dim=64, disable_coarse_attn=False,
        prop_n_block=4, prop_n_embd=128, dilation=2, in_tw=1, out_tw=5,
        noise_level=0.0,
    )


WORKLOADS = {
    # (cfg fn, field shape, rollout steps, batch)
    "ns2d": (ns2d_cfg, (64, 64, 1), 29, 32),
    "sw": (sw_cfg, (96, 192, 3), 42, 8),
    "twophase": (twophase_cfg, (61, 121, 4), 78, 8),
}


def _timed_best(fn, n, tries=3):
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        fn(n)
        best = min(best, time.perf_counter() - t0)
    return best


def _diff_time(fn, reps):
    """Per-iteration time via the tunnel-safe difference protocol, plus an
    uncertainty estimate: the measurement can resolve no finer than the
    spread between repeated t1 / t(1+reps) timings divided by reps."""
    samples_1 = [_timed_best(fn, 1, tries=1) for _ in range(3)]
    samples_n = [_timed_best(fn, 1 + reps, tries=1) for _ in range(3)]
    dt = (min(samples_n) - min(samples_1)) / reps
    err = (max(samples_1) - min(samples_1) + max(samples_n) - min(samples_n)) / reps
    return dt, err


# measured-optimal decode chunk sizes (frames) per workload; see
# BASELINE.md "Single-chip batch scaling" — NS2d's decode scales inversely
# past ~464 frames, SW/two-phase saturate unchunked.
DEFAULT_DECODE_CHUNK = {"ns2d": 116}


def bench_workload(name, dtype=jnp.bfloat16, reps=8, batch=None,
                   decode_chunk="auto", decode_unroll=None):
    from lns_tpu.models import LatentDynamics

    cfg_fn, shape, steps, default_batch = WORKLOADS[name]
    batch = batch or default_batch
    if decode_chunk == "auto":
        decode_chunk = DEFAULT_DECODE_CHUNK.get(name)
    if decode_unroll is None:
        decode_unroll = os.environ.get("LNS_BENCH_DECODE_UNROLL") == "1"
    cfg = cfg_fn()
    model = LatentDynamics(cfg, dtype=dtype, ae_dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch,) + shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]

    @jax.jit
    def rollout_chain(params, x, n):
        def body(i, carry):
            y = model.predict(params, carry, steps=steps, to_x=True,
                              decode_chunk=decode_chunk,
                              decode_unroll=decode_unroll)
            return carry + 1e-6 * y[:, -1]

        return jax.lax.fori_loop(0, n, body, x)[0, 0, 0, 0]

    run = lambda n: np.asarray(rollout_chain(params, x, n))
    run(1)  # compile + warmup
    dt, err = _diff_time(run, reps)
    fps = batch * steps / dt
    r = {
        "rollout_steps": steps,
        "batch": batch,
        "rollout_ms": round(dt * 1e3, 2),
        "rollout_ms_err": round(err * 1e3, 2),
        "frames_per_sec_per_chip": round(fps, 1),
    }
    if decode_chunk is not None:
        r["decode_chunk"] = decode_chunk
    return r


def bench_train_step(name, dtype=jnp.float32, reps=10, batch=32):
    """Stage-2 rollout-BPTT training step throughput (samples/s), with an
    uncertainty bound from the difference protocol's timing spread — at the
    NS2d latent size the step is sub-resolution, so the error matters."""
    import optax

    from lns_tpu.models import LatentDynamics

    cfg_fn, shape, steps, _ = WORKLOADS[name]
    cfg = cfg_fn()
    model = LatentDynamics(cfg, dtype=dtype, ae_dtype=dtype)
    lr_h = cfg.latent_resolution
    lr_w = {"ns2d": 8, "sw": 24, "twophase": 15}[name]
    z_in = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, lr_h, lr_w, cfg.latent_dim))
    z_out = jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.out_tw, lr_h, lr_w, cfg.latent_dim))
    params = model.init(jax.random.PRNGKey(0), (1,) + shape)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params["propagator"])

    @jax.jit
    def step_chain(prop_params, opt_state, n):
        def body(i, carry):
            pp, os_ = carry

            def loss_fn(q):
                return model.rollout_loss({"vq_ae": params["vq_ae"], "propagator": q}, z_in, z_out)

            loss, grads = jax.value_and_grad(loss_fn)(pp)
            updates, os_ = tx.update(grads, os_, pp)
            return optax.apply_updates(pp, updates), os_

        pp, _ = jax.lax.fori_loop(0, n, body, (prop_params, opt_state))
        return jax.tree.leaves(pp)[0].ravel()[0]

    run = lambda n: np.asarray(step_chain(params["propagator"], opt_state, n))
    run(1)  # compile + warmup
    dt, err = _diff_time(run, reps)
    out = {
        "train_step_ms": round(dt * 1e3, 3),
        "train_step_ms_err": round(err * 1e3, 3),
        "train_samples_per_sec": round(batch / dt, 1),
    }
    if err > 0.5 * max(dt, 1e-9):
        out["train_step_note"] = (
            "step time below measurement resolution; samples/s is a lower-"
            "confidence figure")
    return out


def bench_stage1_train_step(name, dtype=jnp.float32, reps=5):
    """Stage-1 AE training-step throughput (fwd+bwd+adam, samples/s)."""
    import optax

    from lns_tpu.models import SimpleAutoencoder
    from lns_tpu.ops.losses import relative_lp_loss

    cfg_fn, shape, _, _ = WORKLOADS[name]
    cfg = cfg_fn()
    ae = SimpleAutoencoder(cfg, dtype=dtype)
    batch = 32
    x = jax.random.normal(jax.random.PRNGKey(1), (batch,) + shape)
    params = ae.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adam(3e-5, b1=0.5, b2=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step_chain(params, opt_state, x, n):
        def body(i, carry):
            p, os_ = carry

            def loss_fn(q):
                x_hat = ae.apply({"params": q}, x).astype(jnp.float32)
                return relative_lp_loss(x_hat, x, reduce_dim=(1, 2), reduce_all=True)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, os_ = tx.update(grads, os_, p)
            return optax.apply_updates(p, updates), os_

        p, _ = jax.lax.fori_loop(0, n, body, (params, opt_state))
        return jax.tree.leaves(p)[0].ravel()[0]

    np.asarray(step_chain(params, opt_state, x, 1))

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(step_chain(params, opt_state, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = t(1), t(1 + reps)
    dt = (tn - t1) / reps
    key = "stage1" if dtype == jnp.float32 else "stage1_bf16"
    return {
        f"{key}_step_ms": round(dt * 1e3, 2),
        f"{key}_samples_per_sec": round(batch / dt, 1),
    }


def batch_sweep(workloads, batches=(8, 16, 32, 64, 128, 256)):
    """Single-chip batch-scaling curves: rollout throughput vs batch size.

    This is the honest single-chip scaling evidence (BASELINE.md): fixed
    model, growing batch — shows where the chip saturates and how much of
    the small-batch time is fixed overhead. Writes results_batch_scaling.json.
    """
    out_path = os.path.join(HERE, "results_batch_scaling.json")
    results = {"device": str(jax.devices()[0])}
    if os.path.exists(out_path):
        # merge across invocations so per-workload batch lists can differ
        with open(out_path) as f:
            results.update(json.load(f))
        results["device"] = str(jax.devices()[0])
    for name in workloads:
        rows = []
        for b in batches:
            try:
                # unchunked: the sweep characterizes the raw decode scaling
                r = bench_workload(name, batch=b, reps=4, decode_chunk=None)
            except Exception as e:  # typically HBM OOM at the largest batches
                r = {"batch": b, "error": repr(e)[:200]}
            rows.append(r)
            print(f"{name} batch={b}: {json.dumps(r)}", flush=True)
            results[name] = rows
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)
    return results


BASELINE_MD = os.path.join(os.path.dirname(HERE), "BASELINE.md")
A100_EST_FPS = 5000.0  # analytic A100 estimate, BASELINE.md "A100 estimate"
TABLE_BEGIN = "<!-- BEGIN measured-results (emitted by run_benchmarks.py --emit-baseline-table) -->"
TABLE_END = "<!-- END measured-results -->"

WORKLOAD_LABELS = {
    "ns2d": "NS2d 64x64x1 (8x8x16 latent)",
    "twophase": "Two-phase 61x121x4 (7x15x64 latent)",
    "sw": "Shallow water 96x192x3 (12x24x64 latent)",
}


def emit_baseline_table():
    """Regenerate BASELINE.md's measured-results block from the committed
    results_*.json files (VERDICT r3 item 4: the scoreboard must never
    drift from the measurements again)."""
    rows = []
    for name in ("ns2d", "twophase", "sw"):
        path = os.path.join(HERE, f"results_{name}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            r = json.load(f)[name]
        vs = (f"{r['frames_per_sec_per_chip'] / A100_EST_FPS:.2f}x"
              if name == "ns2d" else "—")
        chunk = r.get("decode_chunk")
        extra = f" (chunk {chunk})" if chunk else ""
        rows.append(
            f"| {WORKLOAD_LABELS[name]} | {r['rollout_steps']} steps | "
            f"{r['batch']} | {r['rollout_ms']} ms{extra} | "
            f"**{r['frames_per_sec_per_chip']:,.0f}** | {vs} |")
    block = "\n".join([
        TABLE_BEGIN,
        "",
        "| workload | rollout | batch | fused rollout | frames/s/chip | vs A100 est. |",
        "|---|---|---|---|---|---|",
        *rows,
        "",
        TABLE_END,
    ])
    with open(BASELINE_MD) as f:
        text = f.read()
    if TABLE_BEGIN not in text or TABLE_END not in text:
        print(f"sentinels not found in {BASELINE_MD}; printing block:\n{block}")
        return
    pre = text.split(TABLE_BEGIN)[0]
    post = text.split(TABLE_END)[1]
    with open(BASELINE_MD, "w") as f:
        f.write(pre + block + post)
    print(f"BASELINE.md measured-results block regenerated from results_*.json")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--emit-baseline-table", action="store_true",
                   help="regenerate BASELINE.md's measured table from the "
                        "committed results_*.json files and exit")
    p.add_argument("--workloads", default="ns2d,sw,twophase")
    p.add_argument("--train-steps", action="store_true", help="also bench train steps")
    p.add_argument("--stage1", action="store_true", help="also bench stage-1 AE train steps")
    p.add_argument("--batch-sweep", action="store_true",
                   help="rollout batch-scaling curves (results_batch_scaling.json)")
    p.add_argument("--batches", default="8,16,32,64,128,256")
    p.add_argument("--decode-chunk", type=int, default=None,
                   help="chunk the fused rollout's batched decode "
                        "(lax.map over (batch*steps)//chunk sub-batches)")
    args = p.parse_args()

    if args.emit_baseline_table:
        emit_baseline_table()
        return

    if args.batch_sweep:
        batch_sweep(args.workloads.split(","),
                    tuple(int(b) for b in args.batches.split(",")))
        return

    results = {"device": str(jax.devices()[0])}
    for name in args.workloads.split(","):
        r = bench_workload(
            name,
            decode_chunk="auto" if args.decode_chunk is None else args.decode_chunk)
        if args.train_steps:
            r.update(bench_train_step(name))
        if args.stage1:
            r.update(bench_stage1_train_step(name))
            # mixed-precision training path (bf16 activations, f32 loss)
            r.update(bench_stage1_train_step(name, dtype=jnp.bfloat16))
        results[name] = r
        print(f"{name}: {json.dumps(r)}", flush=True)
        # per-workload result files (the canonical benchmark artifacts),
        # anchored to this file's directory so any CWD works
        per = {"device": results["device"], name: r}
        with open(os.path.join(HERE, f"results_{name}.json"), "w") as f:
            json.dump(per, f, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
