"""Convergence campaign for the SW and two-phase workload families.

`convergence_run.py` proved end-to-end learning on NS2d; this script does
the same for the three remaining reference experiment families, each on a
solver-generated synthetic corpus with genuine PDE dynamics (the reference
datasets are not available in this environment):

  * sw                    — rotating shallow-water channel
    (lns_tpu/data/sw_solver.py, zarr layout): exercises the half-periodic
    AE, the zarr pipeline, and bf16 mixed precision *under training* at
    96x192 (reference: train_stage1_SW.py / train_stage2_SW.py).
  * twophase              — linear tank sloshing, per-case water depth
    (lns_tpu/data/sloshing_solver.py, vary='depth'): exercises the
    non-squared AE + Dirichlet-wall denormalized loss
    (reference: train_stage1_twophase.py / train_stage2_twophase.py).
  * twophase_conditional  — tank sloshing with per-case driving frequency
    (vary='freq'): exercises the FiLM-conditioned propagator. The corpus
    is built so the frequency is UNIDENTIFIABLE from a single frame
    (random per-case amplitude/phase), so the zero-init FiLM gates must
    demonstrably pick up the conditioning scalar for the rollout to beat
    the shuffled-frequency control
    (reference: train_stage2_twophase_conditional.py:240-286).

Each family trains stage 1 (bf16 mixed precision) + stage 2 (rollout BPTT)
at the reference's shipped architecture/hyperparameters, then reports the
validation curves, the persistence baseline, and — for the conditional
family — rollout rel-L2 with TRUE vs SHUFFLED frequency (the wired-vs-learns
test for zero-init FiLM gates).

    python benchmarks/convergence_families.py [--workloads sw,twophase,...]

Results -> benchmarks/results_convergence_families.json (merged per key).
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

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# configs: the reference's shipped architecture keys per family
# (configs/SW_stage1_ae.yml, configs/twophase_stage1_ae.yml,
#  configs/twophase_stage2_cond_prop.yml), with data paths pointing at the
# solver corpora and epoch counts sized for this time-shared chip.
# ---------------------------------------------------------------------------

def sw_common(paths, ncase):
    return dict(
        latent_dim=64, Ly=96, Lx=192, resolutions=[96, 192], in_channels=3,
        latent_resolution=12, periodic_direction="x", hw_ratio=2,
        encoder_channels=[64, 64, 64, 128, 128], fourier_resolutions=[],
        encoder_res_blocks=1, use_fa=True,
        decoder_channels=[128, 128, 64, 64], attn_resolutions=[24, 48],
        decoder_res_blocks=1, final_smoothing=False,
        decoder_attn_heads=8, decoder_attn_dim=64, disable_coarse_attn=False,
        train_data_dir=paths[0], test_data_dir=paths[1], dataset_stat=paths[2],
        case_len=88, num_case=ncase, overwrite_exist=True,
        # device-resident corpus: removes steady-state host->device batch
        # traffic (and the tunnel frontend's per-transfer host-buffer
        # retention that OOM-killed the first campaign at 131 GB RSS)
        device_data=True,
        project_name="lns-convergence-sw",
    )


def twophase_common(data_dir, stat_path, ncase):
    return dict(
        latent_dim=64, Ly=61, Lx=121, resolutions=[61, 121], in_channels=4,
        latent_resolution=7, is_periodic=False, hw_ratio=2,
        encoder_channels=[64, 64, 64, 128, 128], fourier_resolutions=[],
        encoder_res_blocks=1, use_fa=True,
        decoder_channels=[128, 128, 64, 64], attn_resolutions=[15, 30],
        decoder_res_blocks=1, final_smoothing=False,
        decoder_attn_heads=8, decoder_attn_dim=64,
        data_dir=data_dir, dataset_stat=stat_path, case_len=79,
        num_case=ncase, overwrite_exist=True, device_data=True,
        project_name="lns-convergence-twophase",
    )


def make_cfgs(workload, workdir, args):
    """Returns (corpus builder fn, stage1 Config, stage2 Config)."""
    from lns_tpu.config import Config

    wdir = os.path.join(workdir, workload)
    os.makedirs(wdir, exist_ok=True)
    s1_dir = os.path.join(wdir, "stage1")
    s2_dir = os.path.join(wdir, "stage2")
    ckpt = os.path.join(s1_dir, "checkpoints", "vqgan_epoch_final.msgpack")

    if workload == "sw":
        data = os.path.join(wdir, "sw_corpus")
        paths = (os.path.join(data, "train.zarr"),
                 os.path.join(data, "test.zarr"),
                 os.path.join(data, "normstats.npz"))

        def build():
            if not os.path.exists(paths[0]):
                from lns_tpu.data.sw_solver import make_sw_solver_store
                make_sw_solver_store(data, ncase=args.ncase_sw, case_len=88)

        common = sw_common(paths, args.ncase_sw)
        cfg1 = Config(dict(common, epochs=args.epochs1_sw, learning_rate=3e-5,
                           beta1=0.5, beta2=0.9, batch_size=32,
                           mixed_precision=True, ckpt_every=args.ckpt_every,
                           log_dir=s1_dir))
        # reference SW stage 2: prop_n_block 4, dilation 3, out_tw 5,
        # interval 2, lr 3e-4 (configs/SW_stage2_prop.yml)
        cfg2 = Config(dict(common, epochs=args.epochs2_sw, learning_rate=3e-4,
                           batch_size=32, prop_n_block=4, prop_n_embd=128,
                           dilation=3, out_tw=5, interval=2,
                           ckpt_every=args.ckpt_every,
                           pretrained_checkpoint_path=ckpt, log_dir=s2_dir))
        return build, cfg1, cfg2

    vary = "freq" if workload == "twophase_conditional" else "depth"
    data = os.path.join(wdir, f"sloshing_{vary}")
    stat = os.path.join(wdir, f"twophase_stat_{vary}.npz")

    def build():
        if not os.path.isdir(data) or not os.listdir(data):
            from lns_tpu.data.sloshing_solver import make_sloshing_dir
            make_sloshing_dir(data, ncase=args.ncase_twophase, case_len=79,
                              vary=vary)

    common = twophase_common(data, stat, args.ncase_twophase)
    cfg1 = Config(dict(common, epochs=args.epochs1_tp, learning_rate=3e-5,
                       beta1=0.5, beta2=0.9, batch_size=32,
                       mixed_precision=True, ckpt_every=args.ckpt_every,
                       log_dir=s1_dir))
    extra = {}
    if workload == "twophase_conditional":
        extra = dict(cond_channels=1, cond_emb_channels=64)
    cfg2 = Config(dict(common, epochs=args.epochs2_tp, learning_rate=5e-4,
                       batch_size=32, prop_n_block=4, prop_n_embd=128,
                       dilation=2, in_tw=1, out_tw=5,
                       ckpt_every=args.ckpt_every,
                       pretrained_checkpoint_path=ckpt, log_dir=s2_dir,
                       **extra))
    return build, cfg1, cfg2


# ---------------------------------------------------------------------------

def read_curve(log_dir, key):
    curve = []
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return curve
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                curve.append(rec[key])
    return curve


def persistence_baseline(val_ds, conditional):
    """Sequence-wise rel-L2 of the repeat-frame-0 predictor on the same
    denormalized eval trajectories the model is scored on."""
    from lns_tpu.ops.losses import relative_lp_loss

    ev = val_ds.eval_trajectories()
    x0, y = ev[0], ev[1]
    y_d = np.asarray(val_ds.denormalize(jnp.asarray(y)))
    x_d = np.asarray(val_ds.denormalize(jnp.asarray(x0)))  # [n, 1, h, w, c]
    pred = np.broadcast_to(x_d, y_d.shape)
    seq = np.asarray(relative_lp_loss(jnp.asarray(pred), jnp.asarray(y_d),
                                      reduce_dim=(1, 2, 3), p=2))
    return float(seq.mean())


def conditioning_control(trainer):
    """Rollout rel-L2 with the TRUE conditioning scalar vs a shuffled one.

    The corpus makes the driving frequency unidentifiable from one frame,
    so a propagator whose zero-init FiLM gates stayed dead scores the same
    under both; a gap proves the conditioning path learned
    (reference conditioning surface: train_stage2_twophase_conditional.py:66-75).
    """
    from lns_tpu.ops.losses import relative_lp_loss

    x0, y, cond = trainer.val_ds.eval_trajectories()
    steps = y.shape[1]
    dc = getattr(trainer.cfg, "decode_chunk", None)
    predict = jax.jit(lambda p, x, c: trainer.model.predict(
        p, x, steps, cond=c, to_x=True, decode_chunk=dc))
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(cond))
    # derangement-ish: ensure most entries moved
    if np.mean(perm == np.arange(len(cond))) > 0.2:
        perm = np.roll(np.arange(len(cond)), 1)
    errs = {}
    for tag, cvec in (("true", cond), ("shuffled", cond[perm])):
        seq = []
        for i in range(0, len(x0), 8):
            xb = jnp.asarray(x0[i:i + 8, 0])
            cb = jnp.asarray(cvec[i:i + 8])
            yhat = predict(trainer.params, xb, cb)
            yhat_d = np.asarray(trainer.val_ds.denormalize(yhat))
            y_d = np.asarray(trainer.val_ds.denormalize(
                jnp.asarray(y[i:i + 8])))
            seq.append(np.asarray(relative_lp_loss(
                jnp.asarray(yhat_d), jnp.asarray(y_d),
                reduce_dim=(1, 2, 3), p=2)))
        errs[tag] = float(np.concatenate(seq).mean())
    return errs


def _rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1e6, 2)
    return None


def _write_merged(results):
    out = os.path.join(HERE, "results_convergence_families.json")
    # merge-preserve earlier families across invocations / partial writes
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    return out


def run_family(workload, workdir, args, results):
    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    build, cfg1, cfg2 = make_cfgs(workload, workdir, args)
    s2_ckpt = os.path.join(cfg2.log_dir, "checkpoints", "model_final.msgpack")
    finalize = args.finalize and os.path.exists(s2_ckpt)

    print(f"==== {workload}: corpus", flush=True)
    t0 = time.time()
    build()
    rec = {"corpus_minutes": round((time.time() - t0) / 60, 1)}

    if not args.skip_stage1 and not finalize:
        print(f"==== {workload}: stage 1 ({cfg1.epochs} epochs, bf16 mixed)",
              flush=True)
        t0 = time.time()
        t1 = Stage1Trainer(cfg1, use_wandb=False)
        t1.train()
        rec["stage1_minutes"] = round((time.time() - t0) / 60, 1)
        del t1
    curve1 = read_curve(cfg1.log_dir, "val_recon_loss")
    rec["stage1_val_recon_curve"] = [round(v, 5) for v in curve1]
    rec["stage1_final_recon_rel_l2"] = curve1[-1] if curve1 else None
    rec["stage1_best_recon_rel_l2"] = min(curve1) if curve1 else None
    results[workload] = rec
    _write_merged(results)  # partial write: stage-1 evidence survives a crash
    print(f"[rss after stage 1: {_rss_gb()} GB]", flush=True)

    if finalize:
        print(f"==== {workload}: stage 2 finalize from {s2_ckpt}", flush=True)
        t2 = Stage2Trainer(cfg2, use_wandb=False, prepare_dirs=False)
        t2.load(s2_ckpt)
    else:
        print(f"==== {workload}: stage 2 ({cfg2.epochs} epochs, rollout BPTT)",
              flush=True)
        t0 = time.time()
        t2 = Stage2Trainer(cfg2, use_wandb=False)
        rec["persistence_seq_rel_l2"] = round(
            persistence_baseline(t2.val_ds, t2.conditional), 5)
        _write_merged(results)
        t2.train()
        rec["stage2_minutes"] = round((time.time() - t0) / 60, 1)
    print(f"[rss after stage 2: {_rss_gb()} GB]", flush=True)
    if "persistence_seq_rel_l2" not in rec:
        rec["persistence_seq_rel_l2"] = round(
            persistence_baseline(t2.val_ds, t2.conditional), 5)
    curve2 = read_curve(cfg2.log_dir, "val_seq_rel_l2")
    rec["stage2_val_seq_curve"] = [round(v, 5) for v in curve2]
    rec["stage2_final_seq_rel_l2"] = curve2[-1] if curve2 else None
    rec["stage2_best_seq_rel_l2"] = min(curve2) if curve2 else None
    rec["beats_persistence"] = bool(
        curve2 and curve2[-1] < rec["persistence_seq_rel_l2"])
    rec["best_beats_persistence"] = bool(
        curve2 and min(curve2) < rec["persistence_seq_rel_l2"])
    _write_merged(results)

    # score the conditioning ablation on the BEST checkpoint (the trainers
    # write model_best at every val improvement; older campaign dirs have
    # only the periodic model_{k*ckpt_every} saves — same params, since
    # save() runs right after validate() at epoch k)
    best_ckpt = os.path.join(cfg2.log_dir, "checkpoints", "model_best.msgpack")
    if os.path.exists(best_ckpt):
        t2.load(best_ckpt)
        rec["ablation_checkpoint"] = "model_best"
    if workload == "twophase_conditional":
        ctl = conditioning_control(t2)
        rec["rollout_rel_l2_true_cond"] = round(ctl["true"], 5)
        rec["rollout_rel_l2_shuffled_cond"] = round(ctl["shuffled"], 5)
        rec["conditioning_learned"] = bool(ctl["true"] < 0.8 * ctl["shuffled"])
    print(f"[rss after metrics: {_rss_gb()} GB]", flush=True)

    out = _write_merged(results)
    print(json.dumps(rec, indent=2), flush=True)
    print(f"-> {out}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workloads", default="sw,twophase,twophase_conditional")
    p.add_argument("--workdir", default="/tmp/lns_convergence_families")
    p.add_argument("--ncase-sw", type=int, default=48)
    p.add_argument("--ncase-twophase", type=int, default=64)
    p.add_argument("--epochs1-sw", type=int, default=100)
    p.add_argument("--epochs2-sw", type=int, default=150)
    p.add_argument("--epochs1-tp", type=int, default=150)
    p.add_argument("--epochs2-tp", type=int, default=200)
    p.add_argument("--ckpt-every", type=int, default=25)
    p.add_argument("--skip-stage1", action="store_true",
                   help="reuse existing stage-1 checkpoints in workdir")
    p.add_argument("--finalize", action="store_true",
                   help="skip training when stage-2 model_final exists in "
                        "workdir; recompute the metrics record from the "
                        "checkpoints (crash/OOM recovery)")
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    results = {}
    for w in args.workloads.split(","):
        run_family(w.strip(), args.workdir, args, results)


if __name__ == "__main__":
    main()
