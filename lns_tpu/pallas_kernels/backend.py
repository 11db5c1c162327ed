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
