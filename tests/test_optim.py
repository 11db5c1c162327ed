"""Optimizer/schedule parity with the reference's torch setup."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from lns_tpu.config import Config
from lns_tpu.train.optim import cosine_annealing_per_epoch, stage1_optimizer, stage2_optimizer


def test_cosine_schedule_matches_torch():
    """torch CosineAnnealingLR(T_max=epochs, eta_min=1e-6), stepped per epoch
    (train_stage2_ns2d.py:185, :227)."""
    lr0, epochs, spe = 5e-4, 50, 7
    sched = cosine_annealing_per_epoch(lr0, epochs, spe)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=1e-6)
    torch_lrs = []
    for _ in range(epochs):
        torch_lrs.append(opt.param_groups[0]["lr"])
        tsched.step()
    for epoch in range(epochs):
        mine = float(sched(epoch * spe))          # first step of the epoch
        mine_end = float(sched(epoch * spe + spe - 1))  # last step, same lr
        assert abs(mine - torch_lrs[epoch]) < 1e-9, (epoch, mine, torch_lrs[epoch])
        assert mine == mine_end


def test_adam_step_matches_torch_stage1_betas():
    """One Adam step with betas (0.5, 0.9), eps 1e-8 == torch."""
    cfg = Config(learning_rate=3e-5, beta1=0.5, beta2=0.9)
    tx = stage1_optimizer(cfg)
    w = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    g = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)

    params = {"w": jnp.asarray(w)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    wt = torch.nn.Parameter(torch.tensor(w))
    opt = torch.optim.Adam([wt], lr=3e-5, betas=(0.5, 0.9), eps=1e-8)
    for _ in range(3):
        wt.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=1e-7)


def test_pointwise_correlation_formula():
    from lns_tpu.ops.losses import pointwise_correlation

    a = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 5, 3)).astype(np.float32))
    c = pointwise_correlation(a, a, reduce_dim=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(c), np.ones(2), atol=1e-5)
