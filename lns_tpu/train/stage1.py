"""Stage-1 autoencoder training (reconstruction with relative-L2 loss).

Mirrors the reference TrainAE loops (train_stage1_{ns2d,SW,twophase}.py):
Adam betas (0.5, 0.9), per-epoch validation + checkpointing every
`ckpt_every`, loss = relative_lp_loss over spatial dims with reduce_all;
the two-phase trainer computes the loss on *denormalized* fields
(train_stage1_twophase.py:71-73) — replicated per workload.

TPU-first: a single donated jitted train step; optional 1-D data-parallel
mesh (batch sharded, params replicated, psum gradient reduction inserted by
XLA).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lns_tpu.data import (
    NS2DStage1,
    SWStage1,
    TankSloshingStage1,
    epoch_batches,
    prefetch_to_device,
)
from lns_tpu.models import SimpleAutoencoder
from lns_tpu.ops.losses import relative_lp_loss
from lns_tpu.parallel.mesh import batch_sharding, replicated_sharding, shard_batch
from lns_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_autoencoder_checkpoint,
    save_pytree,
)
from lns_tpu.train.logging_utils import (
    MetricLogger,
    log_sequence,
    plot_error_curve,
    prepare_training,
)
from lns_tpu.train.optim import stage1_optimizer


STAGE1_DATASETS = {
    "ns2d": NS2DStage1,
    "sw": SWStage1,
    "twophase": TankSloshingStage1,
    "twophase_conditional": TankSloshingStage1,
}

# per-workload field channel names; order matches the dataset channel axis
# (reference: train_stage1_SW.py:119-131 logs vx/vy/prs grids + per-channel
# losses; train_stage1_twophase.py prints vx/vy/pressure/vof)
CHANNEL_NAMES = {
    "ns2d": ("vorticity",),
    "sw": ("vx", "vy", "prs"),
    "twophase": ("vx", "vy", "prs", "vof"),
    "twophase_conditional": ("vx", "vy", "prs", "vof"),
}


class Stage1Trainer:
    def __init__(self, cfg, seed: int = 1234, mesh=None, use_wandb: bool = True,
                 prepare_dirs: bool = True, config_path: Optional[str] = None):
        self.cfg = cfg
        self.seed = seed
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)

        if prepare_dirs:
            prepare_training(cfg.log_dir, bool(cfg.overwrite_exist),
                             config_path=config_path, config_dict=cfg.to_dict())
        self.logger = MetricLogger(cfg.log_dir, project=cfg.project_name,
                                   config=cfg.to_dict(), use_wandb=use_wandb)

        ds_cls = STAGE1_DATASETS[cfg.workload]
        self.train_ds = ds_cls(cfg, train_mode=True)
        self.val_ds = ds_cls(cfg, train_mode=False)
        # two-phase computes the training loss on denormalized fields
        self.loss_on_denorm = cfg.workload.startswith("twophase")

        # mixed_precision: true -> bf16 activations, f32 params/optimizer
        # (the loss is computed in f32). A TPU-native option the reference
        # has no equivalent of (no AMP anywhere, SURVEY.md end of intro).
        self.compute_dtype = jnp.bfloat16 if cfg.mixed_precision else None
        self.model = SimpleAutoencoder(cfg, dtype=self.compute_dtype)
        sample = self.train_ds.get_batch(np.arange(1))
        self.key, k = jax.random.split(self.key)
        variables = self.model.init(k, jnp.asarray(sample))
        self.params = variables["params"]
        self.tx = stage1_optimizer(cfg)
        self.opt_state = self.tx.init(self.params)
        self.epoch = 0
        self.start_epoch = 0
        self._ckptr = AsyncCheckpointer() if cfg.async_checkpoint else None

        if cfg.resume_training and cfg.resume_ckpt:
            self.load(cfg.resume_ckpt)

        n_params = sum(p.size for p in jax.tree.leaves(self.params))
        print(f"Number of trainable parameters: {n_params}")

        # best-val tracking: keep `vqgan_epoch_best` = lowest validation
        # reconstruction loss seen so far (the reference saves every
        # ckpt_every only, train_stage1_ns2d.py:63-66)
        self.best_val = float("inf")
        self.best_epoch = None

        # device_data: true -> stage the whole normalized corpus in HBM once
        # and gather batches on-device by index (these corpora are <=1 GB vs
        # 16 GB HBM). Removes all steady-state host->device batch traffic —
        # and sidesteps the axon tunnel frontend's per-transfer host-buffer
        # retention (BASELINE.md "Measured environment note"). On a DP mesh
        # the corpus is sharded on the sample axis and each device gathers
        # from its own shard (see _build_train_step).
        self.device_data = bool(cfg.device_data)
        self._train_step = self._build_train_step()
        self._train_step_dev = self._build_train_step(gather=True) \
            if self.device_data else None
        self._fwd = self._build_forward()

    # ------------------------------------------------------------------
    def _loss(self, params, x):
        x_hat = self.model.apply({"params": params}, x)
        x_hat = x_hat.astype(jnp.float32)  # loss always in f32
        if self.loss_on_denorm:
            x_hat = self.train_ds.denormalize(x_hat)
            x = self.train_ds.denormalize(x)
        # reduce over spatial dims of [b, h, w, c] -> [b, c], then mean
        return relative_lp_loss(x_hat, x, reduce_dim=(1, 2), p=2, reduce_all=True)

    def _build_train_step(self, gather: bool = False):
        def body(params, opt_state, x):
            loss, grads = jax.value_and_grad(self._loss)(params, x)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if gather:
            if self.mesh is not None:
                # sharded-corpus gather: `idx` is [n_dev, b_per_dev] of LOCAL
                # indices; each device gathers its batch slice from its own
                # corpus shard (mirrors Stage2Trainer._build_train_step)
                from jax.sharding import PartitionSpec as P

                mesh, pspec = self.mesh, P("data")

                def gstep(params, opt_state, frames, idx):
                    x = jax.shard_map(
                        lambda f, i: jnp.take(f, i[0], axis=0),
                        mesh=mesh, in_specs=(pspec, pspec), out_specs=pspec,
                    )(frames, idx)
                    return body(params, opt_state, x)

                rep = replicated_sharding(self.mesh)
                csh = batch_sharding(self.mesh)
                return jax.jit(gstep, in_shardings=(rep, rep, csh, csh),
                               donate_argnums=(0, 1))

            def step(params, opt_state, frames, idx):
                return body(params, opt_state, jnp.take(frames, idx, axis=0))

            return jax.jit(step, donate_argnums=(0, 1))

        step = body
        if self.mesh is not None:
            rep = replicated_sharding(self.mesh)
            bsh = batch_sharding(self.mesh)
            return jax.jit(step, in_shardings=(rep, rep, bsh),
                           out_shardings=(rep, rep, rep), donate_argnums=(0, 1))
        return jax.jit(step, donate_argnums=(0, 1))

    def _build_forward(self):
        def fwd(params, x):
            return self.model.apply({"params": params}, x)

        return jax.jit(fwd)

    def _put(self, x):
        x = jnp.asarray(x)
        if self.mesh is not None:
            return shard_batch(self.mesh, x)
        return x

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        n = len(self.train_ds)
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        frames = None
        shard_len = n
        if self.device_data:
            # one corpus-sized transfer; batches gather on-device after this
            if self.mesh is not None:
                assert cfg.batch_size % n_dev == 0, \
                    "device_data on a mesh needs batch_size % n_devices == 0"
                n = n - (n % n_dev)
                shard_len = n // n_dev
                frames = jax.device_put(self.train_ds.get_batch(np.arange(n)),
                                        batch_sharding(self.mesh))
            else:
                frames = jax.device_put(self.train_ds.get_batch(np.arange(n)))
        # per-epoch data order is a pure function of (seed, epoch) so a
        # resumed run at epoch k sees exactly the batches a fresh run would
        for epoch in range(self.start_epoch, cfg.epochs):
            self.epoch = epoch
            rng = np.random.default_rng([self.seed, epoch])
            if epoch % cfg.ckpt_every == 0:
                self._maybe_save_best(self.validate(epoch), epoch)
                self.save(epoch)
            if self.device_data:
                if self.mesh is not None:
                    # stratified per-shard shuffle (see Stage2Trainer.train)
                    b_per = cfg.batch_size // n_dev
                    perms = np.stack([rng.permutation(shard_len)
                                      for _ in range(n_dev)])
                    batches = (perms[:, s * b_per:(s + 1) * b_per]
                               for s in range(shard_len // b_per))
                else:
                    batches = epoch_batches(n, cfg.batch_size, rng,
                                            drop_last=False)
                for idx in batches:
                    self.params, self.opt_state, loss = self._train_step_dev(
                        self.params, self.opt_state, frames, jnp.asarray(idx)
                    )
                    self.logger.log({"rec_loss": loss})
                continue
            batches = (self.train_ds.get_batch(idx)
                       for idx in epoch_batches(n, cfg.batch_size, rng,
                                                drop_last=self.mesh is not None))
            # overlap next batch's host slice + transfer with this step
            for x in prefetch_to_device(batches, self._put):
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, x
                )
                self.logger.log({"rec_loss": loss})
        self._maybe_save_best(self.validate("final"), "final")
        self.save("final")
        if self._ckptr is not None:
            self._ckptr.wait()
        self.logger.finish()

    def _maybe_save_best(self, val: float, epoch) -> None:
        """Keep `vqgan_epoch_best` = the checkpoint with the lowest
        validation reconstruction rel-L2 seen so far."""
        if val >= self.best_val:
            return
        self.best_val, self.best_epoch = float(val), epoch
        ckpt = os.path.join(self.cfg.log_dir, "checkpoints")
        save_pytree(self.params, os.path.join(ckpt, "vqgan_epoch_best.msgpack"))
        with open(os.path.join(ckpt, "meta_epoch_best.json"), "w") as f:
            json.dump({"epoch": self.cfg.epochs if epoch == "final"
                       else int(epoch),
                       "val_recon_loss": self.best_val,
                       "seed": self.seed}, f)

    # ------------------------------------------------------------------
    def validate(self, epoch) -> float:
        """Per-frame reconstruction rel-L2 on denormalized held-out
        trajectories (train_stage1_ns2d.py:99-148)."""
        cfg = self.cfg
        traj = self.val_ds.eval_trajectories()  # [n, t, h, w, c]
        nc, t = traj.shape[:2]
        flat = traj.reshape(nc * t, *traj.shape[2:])
        bs = min(64, flat.shape[0])
        outs = []
        for i in range(0, flat.shape[0], bs):
            chunk = flat[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            y = np.asarray(self._fwd(self.params, jnp.asarray(chunk)))
            outs.append(y[: bs - pad] if pad else y)
        recon = np.concatenate(outs).reshape(traj.shape)

        recon_d = np.asarray(self.val_ds.denormalize(recon))
        traj_d = np.asarray(self.val_ds.denormalize(traj))
        # [n, t, h, w, c] -> rel-L2 over (h, w) -> [n, t, c]
        err = np.asarray(
            relative_lp_loss(jnp.asarray(recon_d), jnp.asarray(traj_d),
                             reduce_dim=(2, 3), p=2)
        )
        val = float(err.mean())
        print(f"Validation Reconstruction Loss: {val}")
        metrics = {"val_recon_loss": val}

        sdir = os.path.join(cfg.log_dir, "samples")
        stride = max(1, t // 6)
        nshow = min(4, nc)
        names = CHANNEL_NAMES.get(cfg.workload, ())
        if len(names) > 1:
            # multi-channel workloads: per-channel losses + per-channel
            # sample/gt grids (reference train_stage1_SW.py:119-131)
            per_ch = err.mean(axis=(0, 1))  # [c]
            for c, name in enumerate(names):
                print(f"Validation Reconstruction Loss on {name}: {per_ch[c]}")
                metrics[f"val_recon_loss_{name}"] = float(per_ch[c])
                spath = os.path.join(sdir, f"sample_{name}_{epoch}.png")
                gpath = os.path.join(sdir, f"gt_{name}_{epoch}.png")
                log_sequence(recon_d[:nshow, ::stride, :, :, c], spath)
                log_sequence(traj_d[:nshow, ::stride, :, :, c], gpath)
                self.logger.log_image(f"sample_{name}", spath)
        else:
            spath = os.path.join(sdir, f"sample_{epoch}.png")
            log_sequence(recon_d[:nshow, ::stride, :, :, 0], spath)
            log_sequence(traj_d[:nshow, ::stride, :, :, 0],
                         os.path.join(sdir, f"gt_{epoch}.png"))
            self.logger.log_image("sample", spath)
        self.logger.log(metrics, echo=False)
        cpath = os.path.join(sdir, f"err_curve_{epoch}.png")
        plot_error_curve(err.mean(axis=(0, 2)), err.std(axis=0).mean(-1), cpath)
        self.logger.log_image("val_error_curve", cpath)
        return val

    def save(self, epoch):
        ckpt = os.path.join(self.cfg.log_dir, "checkpoints")
        path = os.path.join(ckpt, f"vqgan_epoch_{epoch}.msgpack")
        if self._ckptr is not None:
            self._ckptr.save(os.path.join(ckpt, f"vqgan_epoch_{epoch}"), self.params)
        else:
            save_pytree(self.params, path)
        # full-restartability sidecars: optimizer state + epoch counter (the
        # reference stage-1 saves the model only, train_stage1_ns2d.py:63-66)
        save_pytree(self.opt_state, os.path.join(ckpt, f"optim_epoch_{epoch}.msgpack"))
        next_epoch = self.cfg.epochs if epoch == "final" else int(epoch)
        with open(os.path.join(ckpt, f"meta_epoch_{epoch}.json"), "w") as f:
            json.dump({"epoch": next_epoch, "seed": self.seed,
                       "best_val": None if self.best_val == float("inf")
                       else self.best_val,
                       "best_epoch": self.best_epoch}, f)

    def load(self, model_path: str):
        """Resume: restore params, and — for native checkpoints with
        sidecars — the optimizer state, epoch counter, and training seed,
        so training continues from epoch k with the exact batch order an
        uninterrupted run would have seen. Accepts .msgpack files, torch
        .pt, and orbax directories written by the async_checkpoint path."""
        from lns_tpu.train.checkpoint import load_pytree

        self.params = load_autoencoder_checkpoint(self.cfg, model_path, self.params)
        if model_path.endswith(".pt"):
            return
        optim_path = model_path.rstrip("/").replace("vqgan_epoch_", "optim_epoch_")
        if not optim_path.endswith(".msgpack"):
            optim_path += ".msgpack"  # async saves name the model as a bare dir
        if optim_path != model_path and os.path.exists(optim_path):
            self.opt_state = load_pytree(self.opt_state, optim_path)
        meta_path = model_path.rstrip("/").replace("vqgan_epoch_", "meta_epoch_")
        meta_path = os.path.splitext(meta_path)[0] + ".json"
        if meta_path != model_path and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.start_epoch = int(meta["epoch"])
            # the deterministic (seed, epoch) data order only holds if the
            # resumed run uses the original seed, whatever was passed now
            if "seed" in meta:
                self.seed = int(meta["seed"])
            # don't let a resumed run overwrite the best checkpoint with a
            # worse one
            if meta.get("best_val") is not None:
                self.best_val = float(meta["best_val"])
                self.best_epoch = meta.get("best_epoch")
