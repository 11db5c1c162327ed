"""Optimizers and schedules matching the reference's torch setup.

Stage 1: Adam(lr, betas=(beta1, beta2)=(0.5, 0.9), eps=1e-8)
         (train_stage1_ns2d.py:37-54).
Stage 2: Adam(lr, torch-default betas (0.9, 0.999)) +
         CosineAnnealingLR(T_max=epochs, eta_min=1e-6) stepped per epoch
         (train_stage2_ns2d.py:177-187).
"""

from __future__ import annotations

import numpy as np
import optax


def stage1_optimizer(cfg) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=cfg.learning_rate,
        b1=cfg.get("beta1", 0.9),
        b2=cfg.get("beta2", 0.999),
        eps=1e-8,
    )


def cosine_annealing_per_epoch(lr0: float, epochs: int, steps_per_epoch: int,
                               eta_min: float = 1e-6):
    """torch CosineAnnealingLR semantics with per-epoch stepping: the lr is
    constant within an epoch and follows eta_min + (lr0-eta_min) *
    (1 + cos(pi * epoch / T_max)) / 2 across epochs."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.minimum(step // max(1, steps_per_epoch), epochs)
        return eta_min + (lr0 - eta_min) * (1 + jnp.cos(jnp.pi * epoch / epochs)) / 2

    return schedule


def stage2_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = cosine_annealing_per_epoch(cfg.learning_rate, cfg.epochs, steps_per_epoch)
    return optax.adam(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8)
