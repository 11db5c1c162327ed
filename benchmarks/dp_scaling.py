"""Data-parallel scaling curve on a virtual CPU mesh (BASELINE.md scaling
row: "data-parallel two-stage training sharded across ICI").

No multi-chip hardware exists in this environment, so this measures the
SEMANTICS + sharding overheads on an N-virtual-device CPU mesh (the same
path the driver's dryrun_multichip validates): fixed per-device batch
(weak scaling), stage-1 AE step + stage-2 rollout-BPTT step, samples/s vs
device count. Absolute numbers are CPU numbers; the curve shape (overhead
of psum + replication) is the signal.

Must run in a fresh process: python benchmarks/dp_scaling.py [--devices 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="benchmarks/results_dp_scaling.json")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from lns_tpu.config import Config
    from lns_tpu.models import LatentDynamics, SimpleAutoencoder
    from lns_tpu.ops.losses import relative_lp_loss
    from lns_tpu.parallel.mesh import (
        batch_sharding,
        data_mesh,
        replicated_sharding,
        shard_batch,
    )

    cfg = Config(
        latent_dim=16, Ly=32, Lx=32, resolution=32, in_channels=1,
        latent_resolution=8, is_periodic=True,
        encoder_channels=[32, 32, 64, 64], fourier_resolutions=[],
        encoder_res_blocks=1, use_attn_enc=False, use_fa=True,
        decoder_channels=[64, 64, 32], attn_resolutions=[16],
        decoder_res_blocks=1, final_smoothing=False, attn_heads=4, attn_dim=16,
        disable_coarse_attn=False, prop_n_block=2, prop_n_embd=64, dilation=2,
        out_tw=2, interval=1, noise_level=0.0,
    )

    results = {"per_device_batch": args.per_device_batch, "workload": "ns2d-32",
               "mode": "weak-scaling (fixed per-device batch)", "points": []}

    all_devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8) if n <= args.devices]
    for n in counts:
        mesh = data_mesh(all_devices[:n])
        rep = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        batch = args.per_device_batch * n

        model = LatentDynamics(cfg)
        x_shape = (batch, 32, 32, 1)
        params = model.init(jax.random.PRNGKey(0), x_shape)["params"]

        # stage-1 step
        ae = SimpleAutoencoder(cfg)
        tx1 = optax.adam(1e-3, b1=0.5, b2=0.9)
        opt1 = tx1.init(params["vq_ae"])

        def s1(p, o, x):
            def loss_fn(q):
                return relative_lp_loss(ae.apply({"params": q}, x), x,
                                        reduce_dim=(1, 2), reduce_all=True)

            loss, g = jax.value_and_grad(loss_fn)(p)
            u, o = tx1.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        step1 = jax.jit(s1, in_shardings=(rep, rep, bsh),
                        out_shardings=(rep, rep, rep))
        x = shard_batch(mesh, jnp.ones(x_shape))
        p1, o1, l1 = step1(params["vq_ae"], opt1, x)
        jax.block_until_ready(l1)

        def best_of(run, k=2):
            best = float("inf")
            for _ in range(k):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            return best / args.steps

        def run1():
            nonlocal p1, o1, l1
            for _ in range(args.steps):
                p1, o1, l1 = step1(p1, o1, x)
            jax.block_until_ready(l1)

        dt1 = best_of(run1)

        # stage-2 step
        tx2 = optax.adam(1e-3)
        opt2 = tx2.init(params["propagator"])
        z_in = shard_batch(mesh, jnp.ones((batch, 1, 8, 8, cfg.latent_dim)))
        z_out = shard_batch(mesh, jnp.ones((batch, 2, 8, 8, cfg.latent_dim)))

        def s2(pp, o, zi, zo):
            def loss_fn(q):
                return model.rollout_loss(
                    {"vq_ae": params["vq_ae"], "propagator": q}, zi, zo)

            loss, g = jax.value_and_grad(loss_fn)(pp)
            u, o = tx2.update(g, o, pp)
            return optax.apply_updates(pp, u), o, loss

        step2 = jax.jit(s2, in_shardings=(rep, rep, bsh, bsh),
                        out_shardings=(rep, rep, rep))
        p2, o2, l2 = step2(params["propagator"], opt2, z_in, z_out)
        jax.block_until_ready(l2)

        def run2():
            nonlocal p2, o2, l2
            for _ in range(args.steps):
                p2, o2, l2 = step2(p2, o2, z_in, z_out)
            jax.block_until_ready(l2)

        dt2 = best_of(run2)

        point = {
            "devices": n,
            "global_batch": batch,
            "stage1_step_ms": round(dt1 * 1e3, 2),
            "stage1_samples_per_sec": round(batch / dt1, 1),
            "stage2_step_ms": round(dt2 * 1e3, 2),
            "stage2_samples_per_sec": round(batch / dt2, 1),
        }
        results["points"].append(point)
        print(json.dumps(point))

    # On ONE physical core, n virtual devices time-share: the ideal
    # weak-scaling step time is n * t(1) (n x the work, no extra hardware).
    # overhead = t(n) / (n * t(1)) - 1 isolates the cost the sharding adds
    # (psum emulation, partitioning) from the absent parallel hardware.
    base = results["points"][0]
    last = results["points"][-1]
    ratio = last["devices"] / base["devices"]
    results["stage1_sharding_overhead_vs_serial_ideal"] = round(
        last["stage1_step_ms"] / (ratio * base["stage1_step_ms"]) - 1.0, 3)
    results["stage2_sharding_overhead_vs_serial_ideal"] = round(
        last["stage2_step_ms"] / (ratio * base["stage2_step_ms"]) - 1.0, 3)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"sharding overhead vs serial ideal: "
          f"stage1 {results['stage1_sharding_overhead_vs_serial_ideal']}, "
          f"stage2 {results['stage2_sharding_overhead_vs_serial_ideal']}")


if __name__ == "__main__":
    main()
