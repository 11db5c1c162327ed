"""Pallas kernel enablement.

Kernels default OFF everywhere — the XLA formulations are faster on this
stack (round-2 measurements, see `enabled()` below and DESIGN.md "Pallas on
this stack"); the kernels remain a validated opt-in library. Override with
LNS_TPU_PALLAS=0/1 or `set_enabled()`.
"""

from __future__ import annotations

import os
from typing import Optional

_override: Optional[bool] = None


def set_enabled(value: Optional[bool]):
    global _override
    _override = value


def enabled() -> bool:
    if _override is not None:
        return _override
    env = os.environ.get("LNS_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    # Default OFF — settled by round-2 measurements (DESIGN.md "Pallas on
    # this stack"): Pallas DMA sustains ~260 GB/s on v5e-via-axon vs XLA's
    # 671 GB/s (probe_pallas_bw.py), so even pass-minimal kernels lose to
    # the XLA formulations at every benchmark shape (pipeline 84.9 ms vs
    # 63.2 decode; fused axial+IN 50.6 ms vs 17.7 XLA). The kernels remain
    # a validated, golden-tested library for stacks where Pallas DMA runs
    # at full bandwidth.
    return False


_rollout_override: Optional[bool] = None


def set_rollout_enabled(value: Optional[bool]):
    global _rollout_override
    _rollout_override = value


def rollout_enabled() -> bool:
    """Gate for the fused latent-rollout kernel (prop_rollout.py) — the one
    Pallas kernel that beats XLA on this stack, because the rollout scan is
    kernel-LAUNCH-bound, not DMA-bound (the weakness `enabled()` documents
    doesn't apply: weights are DMA'd into VMEM once and 29-78 sequential
    steps run from VMEM). Measured: NS2d 29-step scan 2.1 -> 1.4 ms, SW
    42-step 6.0 -> 3.7 ms; two-phase (zeros padding, 7x15 grid) LOSES
    (3.6 -> 5.9 ms: 9 masked taps + tiny per-step compute), which is why
    LatentDynamics additionally gates on padding mode.

    Default ON when running on a single TPU device. Multi-device processes
    default OFF: a pallas_call inside a pjit with sharded batch forces XLA
    to replicate, so the XLA scan (which partitions cleanly) wins there.
    Override with LNS_TPU_PALLAS_ROLLOUT=0/1 or `set_rollout_enabled()`.
    """
    if _rollout_override is not None:
        return _rollout_override
    env = os.environ.get("LNS_TPU_PALLAS_ROLLOUT")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax

    return jax.default_backend() == "tpu" and jax.device_count() == 1


_fab2p_override: Optional[bool] = None


def set_fab2p_enabled(value: Optional[bool]):
    global _fab2p_override
    _fab2p_override = value


def fab2p_enabled() -> bool:
    """Gate for the fused FAB core (fab_core.py): apply-pair + IN stats +
    folded out-projection in one Mosaic program, value tensor never
    written to HBM.

    Default OFF — permanently on this stack: the round-5 on-chip probe
    campaign (benchmarks/probe_mosaic_dots.py; fab_core.py docstring for
    the full op-class map) established the kernel cannot compile here —
    Mosaic only grants layout freedom to INPUT refs, so the second axial
    contraction (interior axis on a dot-produced/scratch operand) has no
    big-dot form, and the loop-of-2D-dots escape measured ~2x slower than
    the XLA core in round 2. The kernel remains a validated (interpret
    golden-tested) library for stacks whose Mosaic supports rank-3
    interior contractions on non-input operands.

    Override with LNS_TPU_FAB2P=0/1 or `set_fab2p_enabled()`."""
    if _fab2p_override is not None:
        return _fab2p_override
    env = os.environ.get("LNS_TPU_FAB2P")
    if env is not None:
        return env not in ("0", "false", "False")
    return False
