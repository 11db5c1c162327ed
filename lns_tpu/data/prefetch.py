"""Double-buffered host->device input prefetch.

The reference feeds batches synchronously (torch DataLoader workers +
`.to(device)` per batch, train_stage1_ns2d.py:67-73). On TPU the idiomatic
shape is to overlap the NEXT batch's host slice + device transfer with the
CURRENT jitted step: `jax.device_put` dispatches asynchronously, so keeping
a small deque of in-flight device batches hides the transfer entirely
(grain/flax `prefetch_to_device` pattern).

Works for single-device arrays and sharded batches alike — pass the
trainer's `_put` (which applies `shard_batch` under a mesh) as `put`.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator


def prefetch_to_device(batches: Iterable, put: Callable, size: int = 2) -> Iterator:
    """Yield `put(batch)` for each batch, keeping up to `size` transfers
    in flight ahead of the consumer."""
    queue = collections.deque()
    it = iter(batches)

    def enqueue(n):
        for _ in range(n):
            try:
                b = next(it)
            except StopIteration:
                return
            queue.append(put(b))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
