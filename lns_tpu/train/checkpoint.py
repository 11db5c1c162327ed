"""Checkpoint save/restore.

Native format: flax msgpack param/opt-state trees written atomically,
mirroring the reference's file naming (`vqgan_epoch_{n}`, `model_{n}`,
`optim_{n}`, `sched_{n}`; train_stage1_ns2d.py:63-66,
train_stage2_ns2d.py:200-206) with `.msgpack` extensions. Reference torch
`.pt` checkpoints load transparently through the converter
(lns_tpu.utils.torch_compat).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_pytree(tree: Any, path: str) -> None:
    data = serialization.to_bytes(jax.tree.map(np.asarray, tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


class AsyncCheckpointer:
    """Orbax-backed async checkpointing (optional, for large-scale runs):
    saves proceed in the background so the train loop never blocks on IO.
    Falls back to synchronous msgpack saves when orbax is unavailable."""

    def __init__(self):
        try:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        except Exception:
            self._ckptr = None

    def save(self, path: str, tree: Any):
        if self._ckptr is None:
            save_pytree(tree, path + ".msgpack")
            return
        self._ckptr.save(path, jax.tree.map(np.asarray, tree))

    def restore(self, path: str, template: Any):
        if self._ckptr is None:
            return load_pytree(template, path + ".msgpack")
        return self._ckptr.restore(os.path.abspath(path), item=template)

    def wait(self):
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()


def restore_async_checkpoint(path: str, template: Any) -> Any:
    """Restore an orbax directory checkpoint written by AsyncCheckpointer.save
    (the `async_checkpoint: true` save path writes a directory, not a
    msgpack file)."""
    restored = AsyncCheckpointer().restore(path, template)
    # orbax returns numpy leaves; keep the template's structure/dtypes
    return jax.tree.map(lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype),
                        template, restored)


def load_autoencoder_checkpoint(cfg, path: str, template: Optional[Any] = None) -> Dict:
    """Load stage-1 AE params from a reference torch .pt, a native .msgpack
    file, or an orbax directory written by the async_checkpoint path."""
    if os.path.isdir(path):
        assert template is not None, "orbax restore needs a template tree"
        return restore_async_checkpoint(path, template)
    if path.endswith(".pt"):
        from lns_tpu.utils.torch_compat import (
            convert_autoencoder,
            load_torch_state_dict,
            to_jax,
        )

        return to_jax(convert_autoencoder(cfg, load_torch_state_dict(path)))
    assert template is not None, "msgpack restore needs a template tree"
    return load_pytree(template, path)


def load_latent_dynamics_checkpoint(cfg, path: str, template: Optional[Any] = None) -> Dict:
    """Load stage-2 {vq_ae, propagator} params from .pt, .msgpack, or an
    orbax directory (async_checkpoint save)."""
    if os.path.isdir(path):
        assert template is not None, "orbax restore needs a template tree"
        return restore_async_checkpoint(path, template)
    if path.endswith(".pt"):
        from lns_tpu.utils.torch_compat import (
            convert_latent_dynamics,
            load_torch_state_dict,
            to_jax,
        )

        return to_jax(convert_latent_dynamics(cfg, load_torch_state_dict(path)))
    assert template is not None
    return load_pytree(template, path)
