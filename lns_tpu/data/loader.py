"""Batch index iteration + device feeding helpers."""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def epoch_batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    drop_last: bool = False,
) -> Iterator[np.ndarray]:
    """Yield index arrays for one epoch (torch DataLoader semantics)."""
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    stop = (n // batch_size) * batch_size if drop_last else n
    for i in range(0, stop, batch_size):
        yield idx[i : i + batch_size]


def pad_batch(batch: np.ndarray, batch_size: int):
    """Pad a trailing partial batch to `batch_size` (repeat last element) and
    return (padded, valid_count). Keeps jit shapes static for eval loops."""
    valid = batch.shape[0]
    if valid == batch_size:
        return batch, valid
    reps = batch_size - valid
    pad = np.repeat(batch[-1:], reps, axis=0)
    return np.concatenate([batch, pad], axis=0), valid
