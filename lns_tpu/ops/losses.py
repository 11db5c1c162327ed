"""Loss functions and eval metrics.

`relative_lp_loss` is both the stage-1 training loss and the headline eval
metric of the reference (training_utils.py:9-23); semantics are matched
exactly including the eps floor on the ground-truth norm. `smooth_l1_loss`
matches torch.nn.functional.smooth_l1_loss (beta=1, mean reduction) used for
stage-2 rollout training (train_stage2_ns2d.py:213).

Note on layout: the reference computes losses on [b, (t,) c, h, w]; this
framework is channels-last [b, (t,) h, w, c]. Callers pass `reduce_dim`
appropriate to their layout — the math is layout-agnostic.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp


def relative_lp_loss(
    pred,
    gt,
    reduce_dim: Union[int, Tuple[int, ...]] = (-1, -2, -3),
    reduction: str = "sum",
    eps: float = 1e-8,
    reduce_all: bool = False,
    p: int = 2,
):
    """Per-sample relative Lp error (reference: training_utils.py:9-23).

    sum((pred-gt)^p over reduce_dim) / max(sum(gt^p), eps), then sqrt.
    With reduce_all=True collapses to a scalar mean (used for training).
    """
    reduce_fn = jnp.mean if reduction == "mean" else jnp.sum
    gt_norm = reduce_fn(gt**p, axis=reduce_dim)
    gt_norm = jnp.where(gt_norm < eps, eps, gt_norm)
    diff = reduce_fn((pred - gt) ** p, axis=reduce_dim)
    diff = diff / gt_norm
    if reduce_all:
        return jnp.mean(jnp.sqrt(diff))
    return jnp.sqrt(diff)


def pointwise_correlation(pred, gt, reduce_dim=(-1, -2, -3), eps: float = 1e-8):
    """Normalized inner product (reference: training_utils.py:26-32)."""
    pred_norm = jnp.sqrt(jnp.sum(pred**2, axis=reduce_dim, keepdims=True))
    gt_norm = jnp.sqrt(jnp.sum(gt**2, axis=reduce_dim, keepdims=True))
    pred_n = pred / (pred_norm + eps)
    gt_n = gt / (gt_norm + eps)
    return jnp.sum(pred_n * gt_n, axis=reduce_dim)


def smooth_l1_loss(pred, gt, beta: float = 1.0, reduction: str = "mean"):
    """torch.nn.functional.smooth_l1_loss semantics."""
    d = jnp.abs(pred - gt)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def gradient_domain_loss(
    pred,
    gt,
    weight_space: float = 1.0,
    weight_time: float = 0.0,
    drop_last_channel: bool = True,
    spatial_axes: Tuple[int, int] = (-3, -2),
):
    """Spatial finite-difference relative-L2 (reference GradientDomainLoss,
    training_utils.py:36-77). Channels-last: drops the final channel (vof)
    when `drop_last_channel`; central differences along `spatial_axes`.
    """
    if drop_last_channel:
        pred = pred[..., :-1]
        gt = gt[..., :-1]

    ax_h, ax_w = spatial_axes

    def fd(x, axis):
        n = x.shape[axis]
        hi = jnp.take(x, jnp.arange(2, n), axis=axis)
        lo = jnp.take(x, jnp.arange(0, n - 2), axis=axis)
        return hi - lo

    fd_y_p, fd_x_p = fd(pred, ax_h), fd(pred, ax_w)
    fd_y_g, fd_x_g = fd(gt, ax_h), fd(gt, ax_w)
    rd = (ax_h, ax_w)
    loss = weight_space * (
        relative_lp_loss(fd_y_p, fd_y_g, reduce_dim=rd, reduce_all=True, p=2)
        + relative_lp_loss(fd_x_p, fd_x_g, reduce_dim=rd, reduce_all=True, p=2)
    )
    return loss
