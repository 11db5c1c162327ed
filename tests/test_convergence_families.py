"""Per-family training-dynamics regression tests (slow tier).

tests/test_convergence.py guards the NS2d learning evidence; these do the
same for the three remaining reference experiment families, on small
solver-generated corpora with genuine PDE dynamics (the full-scale runs
live in benchmarks/convergence_families.py -> BASELINE.md):

  * sw                   — half-periodic AE + zarr pipeline + bf16 mixed
    precision under training (reference: train_stage1_SW.py).
  * twophase             — non-squared AE + Dirichlet-wall denormalized
    loss (reference: train_stage1_twophase.py / train_stage2_twophase.py).
  * twophase_conditional — FiLM-conditioned propagator: training must move
    the zero-init gates so the output actually depends on the conditioning
    scalar (reference: train_stage2_twophase_conditional.py:66-75).
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


def _sw_cfg(tmpdir, **overrides):
    """Small SW config on a real shallow-water solver corpus (32x64 grid,
    periodic-x channel with walls — the same boundary topology as the
    96x192 reference shapes)."""
    from lns_tpu.config import Config
    from lns_tpu.data.sw_solver import make_sw_solver_store

    data = os.path.join(tmpdir, "sw_corpus")
    train, test, stats = make_sw_solver_store(data, ncase=8, case_len=16,
                                              h=32, w=64, fmt="zarr")
    base = dict(
        latent_dim=16, Ly=32, Lx=64, resolutions=[32, 64], in_channels=3,
        latent_resolution=8, periodic_direction="x", hw_ratio=2,
        encoder_channels=[32, 32, 64, 64], fourier_resolutions=[],
        encoder_res_blocks=1, use_fa=True, decoder_channels=[64, 64, 32],
        attn_resolutions=[16], decoder_res_blocks=1, final_smoothing=False,
        decoder_attn_heads=4, decoder_attn_dim=16, disable_coarse_attn=False,
        train_data_dir=train, test_data_dir=test, dataset_stat=stats,
        case_len=16, num_case=8, out_tw=2, interval=1, batch_size=8,
        epochs=1, learning_rate=3e-3, beta1=0.5, beta2=0.9, ckpt_every=1000,
        log_dir=os.path.join(tmpdir, "log_sw"), overwrite_exist=True,
        prop_n_block=2, prop_n_embd=32, dilation=2, mixed_precision=True,
    )
    base.update(overrides)
    return Config(base)


def _tank_cfg(tmpdir, vary, **overrides):
    """Small two-phase config on the linear-sloshing solver corpus."""
    from lns_tpu.config import Config
    from lns_tpu.data.sloshing_solver import make_sloshing_dir

    data = os.path.join(tmpdir, f"tank_{vary}")
    make_sloshing_dir(data, ncase=12, case_len=16, h=31, w=61, vary=vary)
    base = dict(
        latent_dim=16, Ly=31, Lx=61, resolutions=[31, 61], in_channels=4,
        latent_resolution=7, is_periodic=False, hw_ratio=2,
        encoder_channels=[32, 32, 64, 64], fourier_resolutions=[],
        encoder_res_blocks=1, use_fa=True, decoder_channels=[64, 64, 32],
        attn_resolutions=[15], decoder_res_blocks=1, final_smoothing=False,
        decoder_attn_heads=4, decoder_attn_dim=16, disable_coarse_attn=False,
        data_dir=data, dataset_stat=os.path.join(tmpdir, f"stat_{vary}.npz"),
        case_len=16, num_case=12, in_tw=1, out_tw=2, batch_size=8,
        epochs=1, learning_rate=3e-3, beta1=0.5, beta2=0.9, ckpt_every=1000,
        log_dir=os.path.join(tmpdir, f"log_tank_{vary}"), overwrite_exist=True,
        prop_n_block=2, prop_n_embd=32, dilation=2,
    )
    base.update(overrides)
    return Config(base)


def test_sw_stage1_bf16_loss_drops(tmp_path):
    """Half-periodic AE + zarr pipeline + bf16 mixed precision reduces the
    reconstruction loss >5x on a real shallow-water solver corpus."""
    from lns_tpu.train import Stage1Trainer

    cfg = _sw_cfg(str(tmp_path), epochs=60)
    t = Stage1Trainer(cfg, use_wandb=False)
    t.train()
    losses = _read_metric(cfg.log_dir, "rec_loss")
    assert len(losses) >= 60
    start, end = np.mean(losses[:5]), np.mean(losses[-5:])
    assert end < start / 5, f"loss only moved {start:.3f} -> {end:.3f}"


def test_twophase_two_stage_beats_persistence(tmp_path):
    """Non-squared AE + Dirichlet-wall denormalized loss learns; the
    stage-2 rollout ends below the persistence baseline."""
    import jax.numpy as jnp

    from lns_tpu.ops.losses import relative_lp_loss
    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    cfg = _tank_cfg(str(tmp_path), "depth", epochs=50)
    t1 = Stage1Trainer(cfg, use_wandb=False)
    t1.train()
    losses = _read_metric(cfg.log_dir, "rec_loss")
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) / 5
    ae_ckpt = os.path.join(cfg.log_dir, "checkpoints",
                           "vqgan_epoch_final.msgpack")

    cfg2 = cfg.replace(log_dir=str(tmp_path / "s2"), epochs=60,
                       learning_rate=2e-3,
                       pretrained_checkpoint_path=ae_ckpt)
    t2 = Stage2Trainer(cfg2, use_wandb=False)
    x0, y = t2.val_ds.eval_trajectories()
    steps = y.shape[1]
    pred = np.repeat(x0[:, :1], steps, axis=1)
    pred_d = np.asarray(t2.val_ds.denormalize(jnp.asarray(pred)))
    y_d = np.asarray(t2.val_ds.denormalize(jnp.asarray(y)))
    persistence = float(np.asarray(relative_lp_loss(
        jnp.asarray(pred_d), jnp.asarray(y_d),
        reduce_dim=(1, 2, 3), p=2)).mean())
    t2.train()
    seq = _read_metric(cfg2.log_dir, "val_seq_rel_l2")
    assert seq[-1] < persistence, (
        f"rollout rel-L2 {seq[-1]:.3f} vs persistence {persistence:.3f}")


def test_conditional_film_gates_learn(tmp_path):
    """Stage-2 conditional training must move the zero-init FiLM gates: at
    init the propagator output is IDENTICAL for any conditioning value
    (zero_module gates, cond_utils.py:12-16 lineage); after training it
    must depend on it. Catches a silently-dead conditioning path."""
    import jax
    import jax.numpy as jnp

    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    cfg = _tank_cfg(str(tmp_path), "freq", epochs=30)
    t1 = Stage1Trainer(cfg, use_wandb=False)
    t1.train()
    ae_ckpt = os.path.join(cfg.log_dir, "checkpoints",
                           "vqgan_epoch_final.msgpack")

    cfg2 = cfg.replace(log_dir=str(tmp_path / "s2"), epochs=40,
                       learning_rate=2e-3, cond_channels=1,
                       cond_emb_channels=16,
                       pretrained_checkpoint_path=ae_ckpt)
    t2 = Stage2Trainer(cfg2, use_wandb=False)

    def cond_sensitivity(prop_params):
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 15, 16))
        params = {"vq_ae": t2.ae_params, "propagator": prop_params}
        y_lo = t2.model.propagate(params, z, jnp.full((2,), 0.1))
        y_hi = t2.model.propagate(params, z, jnp.full((2,), 0.9))
        return float(jnp.max(jnp.abs(y_lo - y_hi)))

    assert cond_sensitivity(t2.prop_params) == 0.0, (
        "zero-init FiLM gates must make the init output cond-independent")
    t2.train()
    train_losses = _read_metric(cfg2.log_dir, "loss")
    assert np.mean(train_losses[-5:]) < np.mean(train_losses[:5]) / 2
    sens = cond_sensitivity(t2.prop_params)
    assert sens > 1e-4, (
        f"conditioning path never learned: output moves only {sens:.2e} "
        "across the freq range")
