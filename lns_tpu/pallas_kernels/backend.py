"""Pallas kernel enablement.

Kernels default ON when the backend is TPU, OFF elsewhere (the XLA
fallbacks are the reference implementations). Override with
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
    # default: opt-in (flip to backend-detection once kernels are validated
    # at full benchmark scale on hardware)
    return False
