"""Convergence campaign: prove the framework *learns* end-to-end.

Generates a Navier-Stokes corpus with the pseudo-spectral solver
(lns_tpu/data/ns2d_solver.py — same FNO-style forced-turbulence regime as
the reference's ns2d_1e-4_solution npz), then runs the full two-stage
pipeline at the reference's shipped NS2d architecture and hyperparameters
(configs/ns2d_atage1_ae.yml: lr 3e-5, betas (0.5, 0.9), batch 32;
configs/ns2d_stage2_prop.yml: lr 5e-4, cosine, out_tw 2) and records:

  * stage-1 validation reconstruction rel-L2 vs epoch (target <= 0.05),
  * stage-2 rollout sequence-wise rel-L2 vs epoch,
  * final 28-step rollout rel-L2 vs the persistence baseline.

    python benchmarks/convergence_run.py [--ncase 128] [--epochs1 300]
        [--epochs2 300] [--workdir /tmp/lns_convergence]

Artifacts: benchmarks/results_convergence.json + error-curve PNGs in the
run's log dirs. Stage-1 uses the mixed-precision bf16 path — this run is
also the evidence that bf16 training converges, not just that it's fast.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

import numpy as np


def build_cfg(args, data_path, stage, workdir):
    """Reference NS2d hyperparameters (configs/ns2d_atage1_ae.yml /
    ns2d_stage2_prop.yml) with data_dir pointing at the solver corpus."""
    from lns_tpu.config import Config

    common = dict(
        latent_dim=16, Ly=64, Lx=64, resolution=64, in_channels=1,
        latent_resolution=8, is_periodic=True,
        encoder_channels=[64, 64, 64, 128, 128], fourier_resolutions=[],
        encoder_res_blocks=1, use_attn_enc=False,
        use_fa=True, decoder_channels=[128, 128, 64, 64],
        attn_resolutions=[16, 32], decoder_res_blocks=1, final_smoothing=False,
        attn_heads=8, attn_dim=64, disable_coarse_attn=False,
        data_dir=data_path, case_len=30, num_case=args.ncase,
        dataset_stat=os.path.join(workdir, "ns2d_solver_stat.npz"),
        interval=1, out_tw=2, noise_level=0.0,
        batch_size=32, overwrite_exist=True,
        project_name="lns-convergence",
    )
    if stage == 1:
        return Config(dict(common, epochs=args.epochs1, learning_rate=3e-5,
                           beta1=0.5, beta2=0.9, ckpt_every=args.ckpt_every,
                           mixed_precision=True,
                           log_dir=os.path.join(workdir, "stage1")))
    return Config(dict(
        common, epochs=args.epochs2, learning_rate=5e-4,
        ckpt_every=args.ckpt_every,
        prop_n_block=3, prop_n_embd=128, dilation=2,
        pretrained_checkpoint_path=os.path.join(
            workdir, "stage1", "checkpoints", "vqgan_epoch_final.msgpack"),
        log_dir=os.path.join(workdir, "stage2")))


def persistence_baseline(val_ds):
    """Sequence-wise rel-L2 of the repeat-frame-0 predictor on the same
    denormalized eval trajectories the model is scored on."""
    import jax.numpy as jnp

    from lns_tpu.ops.losses import relative_lp_loss

    x0, y = val_ds.eval_trajectories()
    steps = y.shape[1]
    pred = np.repeat(x0[:, :1], steps, axis=1)  # [n, t, h, w, c]
    pred_d = np.asarray(val_ds.denormalize(jnp.asarray(pred)))
    y_d = np.asarray(val_ds.denormalize(jnp.asarray(y)))
    seq = np.asarray(relative_lp_loss(jnp.asarray(pred_d), jnp.asarray(y_d),
                                      reduce_dim=(1, 2, 3), p=2))
    frame = np.asarray(relative_lp_loss(jnp.asarray(pred_d), jnp.asarray(y_d),
                                        reduce_dim=(2, 3), p=2))
    return float(seq.mean()), frame.mean(axis=(0, 2)).tolist()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ncase", type=int, default=128)
    p.add_argument("--epochs1", type=int, default=300)
    p.add_argument("--epochs2", type=int, default=300)
    p.add_argument("--ckpt-every", type=int, default=25)
    p.add_argument("--workdir", default="/tmp/lns_convergence")
    p.add_argument("--skip-stage1", action="store_true",
                   help="reuse an existing stage-1 checkpoint in workdir")
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from lns_tpu.data.ns2d_solver import make_ns2d_solver_npz
    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    # ---- corpus ----------------------------------------------------------
    data_path = os.path.join(args.workdir, f"ns2d_solver_{args.ncase}.npz")
    if not os.path.exists(data_path):
        print(f"generating {args.ncase}-case NS corpus (visc 1e-4) ...", flush=True)
        t0 = time.time()
        make_ns2d_solver_npz(data_path, ncase=args.ncase, case_len=30, n=64,
                             visc=1e-4, t_record=1.0, dt=2.5e-4,
                             spinup_records=10)
        print(f"corpus done in {time.time() - t0:.0f}s -> {data_path}", flush=True)

    results = {"ncase": args.ncase, "arch": "reference ns2d (stage1 bf16 mixed)",
               "hparams": {"stage1_lr": 3e-5, "stage2_lr": 5e-4,
                           "batch": 32, "epochs1": args.epochs1,
                           "epochs2": args.epochs2}}

    # ---- stage 1 ---------------------------------------------------------
    cfg1 = build_cfg(args, data_path, 1, args.workdir)
    if not args.skip_stage1:
        print("== stage 1 (bf16 mixed precision, reference hparams)", flush=True)
        t0 = time.time()
        t1 = Stage1Trainer(cfg1, use_wandb=False)
        t1.train()
        results["stage1_minutes"] = round((time.time() - t0) / 60, 1)
    # read the validation curve back from the metric log
    curve1 = []
    with open(os.path.join(cfg1.log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_recon_loss" in rec:
                curve1.append(rec["val_recon_loss"])
    results["stage1_val_recon_curve"] = [round(v, 5) for v in curve1]
    results["stage1_final_recon_rel_l2"] = curve1[-1] if curve1 else None
    print(f"stage-1 val recon curve: {curve1}", flush=True)

    # ---- stage 2 ---------------------------------------------------------
    print("== stage 2 (rollout BPTT, reference hparams)", flush=True)
    cfg2 = build_cfg(args, data_path, 2, args.workdir)
    t0 = time.time()
    t2 = Stage2Trainer(cfg2, use_wandb=False)
    pers_seq, pers_frame = persistence_baseline(t2.val_ds)
    results["persistence_seq_rel_l2"] = round(pers_seq, 5)
    t2.train()
    results["stage2_minutes"] = round((time.time() - t0) / 60, 1)

    curve2 = []
    with open(os.path.join(cfg2.log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_seq_rel_l2" in rec:
                curve2.append(rec["val_seq_rel_l2"])
    results["stage2_val_seq_curve"] = [round(v, 5) for v in curve2]
    results["stage2_final_seq_rel_l2"] = curve2[-1] if curve2 else None
    results["beats_persistence"] = bool(curve2 and curve2[-1] < pers_seq)

    out = os.path.join(HERE, "results_convergence.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2), flush=True)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
