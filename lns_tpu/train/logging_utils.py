"""Run-directory preparation, image logging, metric logging.

Keeps the reference's log_dir layout (`checkpoints/`, `samples/`,
`code_cache/` + config snapshot; training_utils.py:80-100) and its PNG
sample grids (training_utils.py:103-142), and adds a JSONL metrics stream.
wandb is used when importable, silently skipped otherwise.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

import numpy as np


def prepare_training(log_dir: str, overwrite_exist: bool, config_path: Optional[str] = None,
                     config_dict: Optional[dict] = None) -> None:
    if os.path.exists(log_dir):
        if overwrite_exist:
            shutil.rmtree(log_dir)
        else:
            raise RuntimeError(
                "log_dir already exists and overwrite argument is False; "
                "check the config"
            )
    os.makedirs(log_dir)
    os.makedirs(os.path.join(log_dir, "checkpoints"))
    os.makedirs(os.path.join(log_dir, "samples"))
    os.makedirs(os.path.join(log_dir, "code_cache"))
    if config_path and os.path.exists(config_path):
        shutil.copy(config_path, os.path.join(log_dir, "config.yaml"))
    if config_dict is not None:
        with open(os.path.join(log_dir, "config.json"), "w") as f:
            json.dump(config_dict, f, indent=2, default=str)
    # reproducibility snapshot: package source + git revision
    try:
        import lns_tpu

        pkg_dir = os.path.dirname(lns_tpu.__file__)
        shutil.copytree(
            pkg_dir,
            os.path.join(log_dir, "code_cache", "lns_tpu"),
            ignore=shutil.ignore_patterns("__pycache__"),
        )
    except Exception:
        pass


class MetricLogger:
    """stdout + JSONL (+ wandb when available) scalar logger.

    Device scalars (0-d jax Arrays) are logged WITHOUT forcing a host
    fetch: they are buffered and materialized in one stacked device->host
    transfer at flush points (every `flush_every` records, at any
    non-deferred log, and at finish()). On this stack a host fetch costs a
    ~30 ms tunnel round-trip, so fetching the loss every train step would
    dominate the step time; deferral keeps the train loop dispatch-only.
    When wandb is active, values are fetched eagerly (wandb needs them).
    """

    def __init__(self, log_dir: str, project: Optional[str] = None, config: Optional[dict] = None,
                 use_wandb: bool = True, flush_every: int = 512):
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._step = 0
        self._pending = []  # [(rec, [(key, 0d-jax-array), ...]), ...]
        self._flush_every = flush_every
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, config=config)
                self.wandb = wandb
            except Exception:
                self.wandb = None

    @staticmethod
    def _is_device_scalar(v):
        try:
            import jax

            return isinstance(v, jax.Array) and v.ndim == 0
        except Exception:
            return False

    def _flush_pending(self):
        if not self._pending:
            return
        import jax.numpy as jnp

        arrays = [a for _, dev in self._pending for _, a in dev]
        vals = iter(np.asarray(jnp.stack(arrays)))  # ONE host fetch
        for rec, dev in self._pending:
            for key, _ in dev:
                rec[key] = float(next(vals))
            self._f.write(json.dumps(rec) + "\n")
        self._pending = []
        self._f.flush()

    def log(self, metrics: dict, step: Optional[int] = None, echo: bool = False):
        step = self._step if step is None else step
        self._step = step + 1
        rec = {"step": step, "time": time.time()}
        defer = self.wandb is None and not echo
        dev = []
        for k, v in metrics.items():
            if defer and self._is_device_scalar(v):
                dev.append((k, v))
            else:
                rec[k] = float(v) if np.isscalar(v) or hasattr(v, "item") else v
        if dev:
            self._pending.append((rec, dev))
            if len(self._pending) >= self._flush_every:
                self._flush_pending()
            return
        self._flush_pending()  # keep the JSONL in chronological order
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if echo:
            print(" ".join(f"{k}={v}" for k, v in rec.items() if k != "time"))
        if self.wandb is not None:
            try:
                self.wandb.log(metrics, step=step)
            except Exception:
                pass

    def log_image(self, key: str, png_path: str, step: Optional[int] = None):
        """Push a saved figure/grid PNG to wandb as an Image (the reference
        logs its matplotlib eval figures this way, train_stage2_ns2d.py:277-291).
        The PNG on disk is the primary artifact; wandb is best-effort."""
        if self.wandb is not None:
            try:
                self.wandb.log({key: self.wandb.Image(png_path)},
                               step=self._step if step is None else step)
            except Exception:
                pass

    def finish(self):
        self._flush_pending()
        self._f.close()
        if self.wandb is not None:
            try:
                self.wandb.finish()
            except Exception:
                pass


def log_images(imgs, out_path: str):
    """[b, h, w] grid PNG ('twilight' cmap; training_utils.py:103-121)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from mpl_toolkits.axes_grid1 import ImageGrid

    imgs = np.asarray(imgs)
    b = imgs.shape[0]
    fig = plt.figure(figsize=(8.0, 8.0))
    grid = ImageGrid(fig, 111, nrows_ncols=(max(1, b // 4), min(4, b)))
    for ax, im_no in zip(grid, np.arange(b)):
        ax.imshow(imgs[im_no], cmap="twilight")
        ax.axis("off")
    plt.savefig(out_path, bbox_inches="tight")
    plt.close()


def log_sequence(imgs, out_path: str):
    """[b, t, h, w] grid PNG (training_utils.py:124-142)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from mpl_toolkits.axes_grid1 import ImageGrid

    imgs = np.asarray(imgs)
    b, t = imgs.shape[:2]
    flat = imgs.reshape(b * t, *imgs.shape[2:])
    fig = plt.figure(figsize=(8.0, 8.0))
    grid = ImageGrid(fig, 111, nrows_ncols=(b, t))
    for ax, im_no in zip(grid, np.arange(b * t)):
        ax.imshow(flat[im_no], cmap="twilight")
        ax.axis("off")
    plt.savefig(out_path, bbox_inches="tight")
    plt.close()


def plot_error_curve(err: np.ndarray, err_std: np.ndarray, out_path: str):
    """Rollout error-vs-time curve (train_stage2_ns2d.py:277-291)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=[6, 4], dpi=200)
    x = np.arange(len(err))
    ax.plot(x, err, color="b")
    ax.fill_between(x, err - err_std, err + err_std, alpha=0.3, color="b")
    plt.ylabel(r"Relative $\mathcal{L}_2$ norm", fontsize=12)
    plt.xlabel("Timesteps", fontsize=12)
    plt.grid(which="both", linestyle="-.")
    plt.savefig(out_path, bbox_inches="tight")
    plt.close()
