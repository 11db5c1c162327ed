"""Conditioning ablation as a parameter sweep, not one pair of scalars.

VERDICT r4 item 7: show the FiLM conditioning path's learning as a CURVE —
per-case rollout error vs the case's true driving frequency, under three
conditioning inputs:

  * true      — each case rolled out with its own frequency scalar
  * shuffled  — frequencies permuted across cases (the wired-vs-learns control)
  * mean      — every case given the corpus-mean frequency (ablates the
                conditioning signal entirely without distribution shift)

The campaign corpus (lns_tpu/data/sloshing_solver.py, vary='freq') makes the
frequency unidentifiable from any single frame (random per-case amplitude and
phase), so a propagator whose zero-init FiLM gates stayed dead scores the
same under all three; separation that grows away from the corpus-mean
frequency is the signature of a consumed conditioning scalar.

Reference conditioning surface: train_stage2_twophase_conditional.py:240-286
(the reference evaluates only with the true parameter; the shuffled/mean
controls and the per-frequency resolution are additions of this rebuild).

    python benchmarks/conditional_sweep.py \
        [--workdir /tmp/lns_convergence_families/twophase_conditional] \
        [--checkpoint .../model_best.msgpack]

Outputs: benchmarks/convergence_artifacts/conditional_sweep.{json,png} and a
summary merged into results_convergence_families.json.
"""

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

import jax.numpy as jnp
import numpy as np


def best_checkpoint(stage2_dir):
    """The checkpoint with the lowest recorded val metric: `model_best` when
    the run tracked it live, else the periodic save at the best val epoch
    (save() runs right after validate() on the same params)."""
    ck = os.path.join(stage2_dir, "checkpoints")
    best = os.path.join(ck, "model_best.msgpack")
    if os.path.exists(best):
        return best, "model_best"
    cfg = json.load(open(os.path.join(stage2_dir, "config.json")))
    curve = []
    with open(os.path.join(stage2_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_seq_rel_l2" in rec:
                curve.append(rec["val_seq_rel_l2"])
    k = int(np.argmin(curve))
    tag = "final" if k == len(curve) - 1 else str(k * int(cfg["ckpt_every"]))
    return os.path.join(ck, f"model_{tag}.msgpack"), f"model_{tag}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir",
                   default="/tmp/lns_convergence_families/twophase_conditional")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--fresh-cases", type=int, default=40,
                   help="generate this many FRESH solver cases (new seed, "
                        "frequencies spanning the training range) and sweep "
                        "over them — the campaign's held-out split has only "
                        "~7 cases, too sparse for a curve; 0 = use the "
                        "held-out split")
    args = p.parse_args()

    from lns_tpu.config import Config
    from lns_tpu.data import ConditionalTankSloshingStage2
    from lns_tpu.models import LatentDynamics
    from lns_tpu.ops.losses import relative_lp_loss
    from lns_tpu.train.checkpoint import load_latent_dynamics_checkpoint

    s2_dir = os.path.join(args.workdir, "stage2")
    cfg = Config(json.load(open(os.path.join(s2_dir, "config.json"))))
    ckpt, ckpt_tag = (args.checkpoint, os.path.basename(args.checkpoint)) \
        if args.checkpoint else best_checkpoint(s2_dir)
    print(f"checkpoint: {ckpt}")

    model = LatentDynamics(cfg)
    if args.fresh_cases:
        # fresh solver cases at a new seed, normalized with the TRAINING
        # stats (cfg.dataset_stat already exists, so the dataset loads it
        # instead of recomputing) — a true generalization sweep
        from lns_tpu.data.sloshing_solver import make_sloshing_dir

        sweep_dir = os.path.join(args.workdir, "sweep_corpus")
        if not os.path.isdir(sweep_dir) or not os.listdir(sweep_dir):
            make_sloshing_dir(sweep_dir, ncase=args.fresh_cases,
                              case_len=int(cfg.case_len), seed=171,
                              vary="freq")
        cfg = cfg.replace(data_dir=sweep_dir, num_case=args.fresh_cases)
        assert os.path.exists(cfg.dataset_stat), "training stats must exist"
        val_ds = ConditionalTankSloshingStage2(cfg, train_mode=True)
    else:
        val_ds = ConditionalTankSloshingStage2(cfg, train_mode=False)
    x0, y, cond = val_ds.eval_trajectories()
    freqs = np.asarray(val_ds.params_raw, np.float32)  # raw Hz per case
    steps = y.shape[1]
    n = x0.shape[0]

    template = model.init(jax.random.PRNGKey(0), (1,) + x0.shape[2:])["params"]
    params = load_latent_dynamics_checkpoint(cfg, ckpt, template)
    dc = getattr(cfg, "decode_chunk", None)
    predict = jax.jit(lambda p, x, c: model.predict(p, x, steps, cond=c,
                                                    to_x=True, decode_chunk=dc))

    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    if np.mean(perm == np.arange(n)) > 0.2:
        perm = np.roll(np.arange(n), 1)
    variants = {
        "true": np.asarray(cond),
        "shuffled": np.asarray(cond)[perm],
        "mean": np.full_like(np.asarray(cond), np.asarray(cond).mean(axis=0)),
    }

    per_case = {}
    for tag, cvec in variants.items():
        errs = []
        for i in range(0, n, args.batch_size):
            xb = jnp.asarray(x0[i:i + args.batch_size, 0])
            cb = jnp.asarray(cvec[i:i + args.batch_size])
            yhat = predict(params, xb, cb)
            yhat_d = val_ds.denormalize(yhat)
            y_d = val_ds.denormalize(jnp.asarray(y[i:i + args.batch_size]))
            errs.append(np.asarray(relative_lp_loss(
                yhat_d, y_d, reduce_dim=(1, 2, 3), p=2)).mean(axis=-1))
        per_case[tag] = np.concatenate(errs)  # [n]
        print(f"{tag:9s} seq rel-L2: {per_case[tag].mean():.4f}")

    order = np.argsort(freqs)
    out = {
        "checkpoint": ckpt_tag,
        "rollout_steps": int(steps),
        "num_cases": int(n),
        "freq_hz": freqs[order].tolist(),
        "err_true": per_case["true"][order].round(5).tolist(),
        "err_shuffled": per_case["shuffled"][order].round(5).tolist(),
        "err_mean_cond": per_case["mean"][order].round(5).tolist(),
        "seq_rel_l2_true": round(float(per_case["true"].mean()), 5),
        "seq_rel_l2_shuffled": round(float(per_case["shuffled"].mean()), 5),
        "seq_rel_l2_mean_cond": round(float(per_case["mean"].mean()), 5),
    }
    out["conditioning_learned"] = bool(
        out["seq_rel_l2_true"] < 0.8 * out["seq_rel_l2_shuffled"])

    adir = os.path.join(HERE, "convergence_artifacts")
    os.makedirs(adir, exist_ok=True)
    jpath = os.path.join(adir, "conditional_sweep.json")
    with open(jpath, "w") as f:
        json.dump(out, f, indent=2)

    # --- figure: per-case rollout error vs true frequency, three series ----
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # fixed CVD-safe categorical order (Tol bright); identity also carried by
    # marker shape so color is never the only channel
    series = [("true", "#4477AA", "o", "true frequency"),
              ("shuffled", "#EE6677", "s", "shuffled frequency"),
              ("mean", "#228833", "^", "corpus-mean frequency")]
    fig, ax = plt.subplots(figsize=(7, 4.2), dpi=130)
    f_sorted = freqs[order]
    for key, color, marker, label in series:
        ax.plot(f_sorted, per_case[key][order], marker=marker, ms=4, lw=1.5,
                color=color, label=label, alpha=0.9)
    ax.axvline(float(freqs.mean()), color="#888888", lw=1, ls="--")
    ax.annotate("corpus mean", (float(freqs.mean()), ax.get_ylim()[1]),
                xytext=(4, -12), textcoords="offset points", fontsize=8,
                color="#666666")
    ax.set_xlabel("case driving frequency (Hz)")
    ax.set_ylabel("rollout sequence rel-L2 (denormalized)")
    ax.set_title(f"FiLM conditioning sweep — {ckpt_tag}, {steps}-step rollout")
    ax.grid(alpha=0.25, lw=0.5)
    ax.legend(frameon=False, fontsize=9)
    fig.tight_layout()
    ppath = os.path.join(adir, "conditional_sweep.png")
    fig.savefig(ppath)
    print(f"-> {jpath}\n-> {ppath}")

    # merge the headline scalars into the campaign record
    rpath = os.path.join(HERE, "results_convergence_families.json")
    if os.path.exists(rpath):
        res = json.load(open(rpath))
        rec = res.setdefault("twophase_conditional", {})
        split = "fresh" if args.fresh_cases else "heldout"
        rec[f"ablation_{split}_{ckpt_tag}"] = {
            "rel_l2_true": out["seq_rel_l2_true"],
            "rel_l2_shuffled": out["seq_rel_l2_shuffled"],
            "rel_l2_mean_cond": out["seq_rel_l2_mean_cond"],
        }
        with open(rpath, "w") as f:
            json.dump(res, f, indent=2)
        print(f"-> merged into {rpath}")


if __name__ == "__main__":
    main()
