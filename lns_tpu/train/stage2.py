"""Stage-2 latent propagator training (rollout BPTT in latent space).

Mirrors the reference TrainDynamics (train_stage2_*.py): a one-time jitted
encode pre-pass over the whole corpus, Adam + cosine annealing over the
propagator parameters only (AE frozen), smooth-L1 rollout loss over out_tw
steps, full-rollout validation with frame-wise and sequence-wise rel-L2.

TPU-first: rollout is a `lax.scan` inside one jitted step (full BPTT, remat
optional), validation uses the fused encode -> scan -> batched-decode
program from LatentDynamics.predict.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lns_tpu.data import (
    ConditionalTankSloshingStage2,
    NS2DStage2,
    SWStage2,
    TankSloshingStage2,
    epoch_batches,
    prefetch_to_device,
)
from lns_tpu.models import LatentDynamics
from lns_tpu.ops.losses import relative_lp_loss
from lns_tpu.parallel.mesh import batch_sharding, replicated_sharding, shard_batch
from lns_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_autoencoder_checkpoint,
    load_latent_dynamics_checkpoint,
    save_pytree,
)
from lns_tpu.train.logging_utils import (
    MetricLogger,
    log_sequence,
    plot_error_curve,
    prepare_training,
)
from lns_tpu.train.optim import stage2_optimizer
from lns_tpu.train.stage1 import CHANNEL_NAMES


STAGE2_DATASETS = {
    "ns2d": NS2DStage2,
    "sw": SWStage2,
    "twophase": TankSloshingStage2,
    "twophase_conditional": ConditionalTankSloshingStage2,
}


class Stage2Trainer:
    def __init__(self, cfg, seed: int = 1234, mesh=None, use_wandb: bool = True,
                 prepare_dirs: bool = True, config_path: Optional[str] = None):
        self.cfg = cfg
        self.seed = seed
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)
        self.conditional = cfg.is_conditional

        if prepare_dirs:
            prepare_training(cfg.log_dir, bool(cfg.overwrite_exist),
                             config_path=config_path, config_dict=cfg.to_dict())
        self.logger = MetricLogger(cfg.log_dir, project=cfg.project_name,
                                   config=cfg.to_dict(), use_wandb=use_wandb)

        # mixed_precision: true -> bf16 activations through the frozen AE
        # and the propagator rollout; params/optimizer/loss stay f32
        dt = jnp.bfloat16 if cfg.mixed_precision else None
        self.model = LatentDynamics(cfg, dtype=dt, ae_dtype=dt)
        ds_cls = STAGE2_DATASETS[cfg.workload]
        self.train_ds = ds_cls(cfg, train_mode=True)
        self.val_ds = ds_cls(cfg, train_mode=False)

        # init params, then load the frozen pretrained AE
        sample = self.train_ds.normalize(
            np.zeros((1,) + self._field_shape(), np.float32)
        )
        self.key, k = jax.random.split(self.key)
        variables = self.model.init(k, sample.shape)
        params = variables["params"]
        if cfg.pretrained_checkpoint_path:
            print(f"Loading pretrained autoencoder from {cfg.pretrained_checkpoint_path}")
            params["vq_ae"] = load_autoencoder_checkpoint(
                cfg, cfg.pretrained_checkpoint_path, params["vq_ae"]
            )
            print("Pretrained autoencoder loaded successfully")
        self.ae_params = params["vq_ae"]      # frozen
        self.prop_params = params["propagator"]  # trainable

        n_params = sum(p.size for p in jax.tree.leaves(self.prop_params))
        print(f"Number of parameters: {n_params}")

        # one-time latent pre-pass (jitted, batched)
        encode = jax.jit(lambda x: self.model.encode({"vq_ae": self.ae_params,
                                                      "propagator": self.prop_params}, x))
        self.train_ds.encode_dataset(encode)

        steps_per_epoch = max(1, len(self.train_ds) // cfg.batch_size)
        self.tx = stage2_optimizer(cfg, steps_per_epoch)
        self.opt_state = self.tx.init(self.prop_params)
        self.noise_level = float(cfg.noise_level or 0.0)

        # device_data: true -> stage the full latent window set in HBM once,
        # gather batches on-device by index (latent corpora are <=1.6 GB).
        # Kills steady-state host->device traffic and sidesteps the axon
        # tunnel frontend's per-transfer host-buffer retention
        # (BASELINE.md "Measured environment note"). On a DP mesh the corpus
        # is sharded across devices on the sample axis and each device
        # gathers its slice of the batch from its own shard via shard_map —
        # no cross-device corpus traffic (see _build_train_step).
        self.device_data = bool(cfg.device_data)
        self._train_step = self._build_train_step()
        self._train_step_dev = self._build_train_step(gather=True) \
            if self.device_data else None
        self._predict_cache = {}
        self.start_epoch = 0
        # best-val tracking: save `model_best` whenever the rollout metric
        # improves (the reference saves every ckpt_every and picks manually,
        # train_stage2_ns2d.py:200-206)
        self.best_val = float("inf")
        self.best_epoch = None
        self._ckptr = AsyncCheckpointer() if cfg.async_checkpoint else None

        # mid-training resume: params + optimizer state (the cosine schedule
        # continues via the restored optax step count) + epoch counter (the
        # reference saves optim/sched state but never reloads it,
        # train_stage2_ns2d.py:200-206)
        if cfg.resume_training and cfg.resume_ckpt:
            self.load(cfg.resume_ckpt)

    def _field_shape(self):
        cfg = self.cfg
        if cfg.workload == "ns2d":
            return (cfg.resolution, cfg.resolution, cfg.in_channels)
        return (cfg.resolutions[0], cfg.resolutions[1], cfg.in_channels)

    # ------------------------------------------------------------------
    def _build_train_step(self, gather: bool = False):
        model = self.model
        ae_params = self.ae_params
        noise = self.noise_level

        def step(prop_params, opt_state, z_in, z_out, cond, key):
            if noise > 0:
                z_in = z_in + noise * jax.random.normal(key, z_in.shape, z_in.dtype)

            def loss_fn(pp):
                params = {"vq_ae": ae_params, "propagator": pp}
                return model.rollout_loss(params, z_in, z_out, cond)

            loss, grads = jax.value_and_grad(loss_fn)(prop_params)
            updates, opt_state = self.tx.update(grads, opt_state, prop_params)
            prop_params = optax.apply_updates(prop_params, updates)
            return prop_params, opt_state, loss

        if gather:
            if self.mesh is not None:
                # Sharded-corpus gather: the corpus lives split across the
                # mesh on its sample axis; `idx` is [n_dev, b_per_dev] of
                # LOCAL indices, one row per device, so each device gathers
                # its batch slice from its own shard. The gathered batch
                # comes out batch-sharded, exactly what the DP step expects.
                from jax.sharding import PartitionSpec as P

                mesh, pspec = self.mesh, P("data")

                def local_gather(*shards_and_idx):
                    *shards, idx_s = shards_and_idx
                    return tuple(jnp.take(s, idx_s[0], axis=0) for s in shards)

                def gstep(prop_params, opt_state, z_in_all, z_out_all,
                          cond_all, idx, key):
                    ops = (z_in_all, z_out_all) + (
                        (cond_all,) if cond_all is not None else ())
                    specs = (pspec,) * len(ops)
                    gathered = jax.shard_map(
                        local_gather, mesh=mesh,
                        in_specs=specs + (pspec,), out_specs=specs,
                    )(*ops, idx)
                    z_in, z_out = gathered[0], gathered[1]
                    cond = gathered[2] if cond_all is not None else None
                    return step(prop_params, opt_state, z_in, z_out, cond, key)

                rep = replicated_sharding(self.mesh)
                csh = batch_sharding(self.mesh)
                return jax.jit(
                    gstep,
                    in_shardings=(rep, rep, csh, csh,
                                  csh if self.conditional else None, csh, rep),
                    donate_argnums=(0, 1),
                )

            def gstep(prop_params, opt_state, z_in_all, z_out_all, cond_all,
                      idx, key):
                z_in = jnp.take(z_in_all, idx, axis=0)
                z_out = jnp.take(z_out_all, idx, axis=0)
                cond = None if cond_all is None \
                    else jnp.take(cond_all, idx, axis=0)
                return step(prop_params, opt_state, z_in, z_out, cond, key)

            return jax.jit(gstep, donate_argnums=(0, 1))

        if self.mesh is not None:
            rep = replicated_sharding(self.mesh)
            bsh = batch_sharding(self.mesh)
            return jax.jit(
                step,
                in_shardings=(rep, rep, bsh, bsh, bsh if self.conditional else None, rep),
                donate_argnums=(0, 1),
            )
        return jax.jit(step, donate_argnums=(0, 1))

    def _put(self, x):
        if x is None:
            return None
        x = jnp.asarray(x)
        if self.mesh is not None:
            return shard_batch(self.mesh, x)
        return x

    @property
    def params(self):
        return {"vq_ae": self.ae_params, "propagator": self.prop_params}

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        n = len(self.train_ds)
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        z_in_all = z_out_all = cond_all = None
        shard_len = n
        if self.device_data:
            # one corpus-sized transfer; batches gather on-device after this
            if self.mesh is not None:
                # shard the corpus across the mesh on the sample axis (trim
                # the ragged tail so shards are equal) — each device then
                # gathers its slice of every batch from its own shard
                assert cfg.batch_size % n_dev == 0, \
                    "device_data on a mesh needs batch_size % n_devices == 0"
                n = n - (n % n_dev)
                shard_len = n // n_dev
            allb = self.train_ds.get_batch(np.arange(n))
            put = (lambda x: jax.device_put(x, batch_sharding(self.mesh))) \
                if self.mesh is not None else jax.device_put
            if self.conditional:
                z_in_np, z_out_np, cond_np = allb
                cond_all = put(cond_np)
            else:
                z_in_np, z_out_np = allb
            z_in_all = put(z_in_np)
            z_out_all = put(z_out_np)
        # per-epoch data order is a pure function of (seed, epoch) so a
        # resumed run at epoch k sees exactly the batches a fresh run would
        base_key = jax.random.PRNGKey(self.seed)
        for epoch in range(self.start_epoch, cfg.epochs):
            rng = np.random.default_rng([self.seed, epoch])
            if epoch % cfg.ckpt_every == 0:
                self._maybe_save_best(self.validate(epoch), epoch)
                self.save(epoch)
            if self.device_data:
                epoch_key = jax.random.fold_in(base_key, epoch)
                if self.mesh is not None:
                    # per-device within-shard permutations: a stratified
                    # shuffle (uniform without replacement per shard) rather
                    # than the host path's global shuffle
                    b_per = cfg.batch_size // n_dev
                    perms = np.stack([rng.permutation(shard_len)
                                      for _ in range(n_dev)])
                    batches = (perms[:, s * b_per:(s + 1) * b_per]
                               for s in range(shard_len // b_per))
                else:
                    batches = epoch_batches(n, cfg.batch_size, rng,
                                            drop_last=True)
                for step, idx in enumerate(batches):
                    k = jax.random.fold_in(epoch_key, step)
                    self.prop_params, self.opt_state, loss = \
                        self._train_step_dev(
                            self.prop_params, self.opt_state, z_in_all,
                            z_out_all, cond_all, jnp.asarray(idx), k,
                        )
                    self.logger.log({"loss": loss})
                continue
            def put(batch):
                if self.conditional:
                    z_in, z_out, cond = batch
                else:
                    (z_in, z_out), cond = batch, None
                return self._put(z_in), self._put(z_out), self._put(cond)

            batches = (self.train_ds.get_batch(idx)
                       for idx in epoch_batches(n, cfg.batch_size, rng,
                                                drop_last=True))
            # noise keys are a pure function of (seed, epoch, step), like the
            # data order, so resume replays the identical noise stream
            epoch_key = jax.random.fold_in(base_key, epoch)
            # overlap next batch's host slice + transfer with this step
            for step, (z_in, z_out, cond) in enumerate(
                    prefetch_to_device(batches, put)):
                k = jax.random.fold_in(epoch_key, step)
                self.prop_params, self.opt_state, loss = self._train_step(
                    self.prop_params, self.opt_state, z_in, z_out, cond, k,
                )
                self.logger.log({"loss": loss})
        self._maybe_save_best(self.validate(cfg.epochs), cfg.epochs)
        self.save("final")
        if self._ckptr is not None:
            self._ckptr.wait()
        self.logger.finish()

    def _maybe_save_best(self, val: float, epoch) -> None:
        """Keep `model_best` = the checkpoint with the lowest validation
        sequence rollout rel-L2 seen so far (improves on the reference,
        which saves every ckpt_every and picks manually)."""
        if val >= self.best_val:
            return
        self.best_val, self.best_epoch = float(val), epoch
        ckpt = os.path.join(self.cfg.log_dir, "checkpoints")
        save_pytree(self.params, os.path.join(ckpt, "model_best.msgpack"))
        with open(os.path.join(ckpt, "meta_best.json"), "w") as f:
            json.dump({"epoch": self.cfg.epochs if epoch == "final"
                       else int(epoch),
                       "val_seq_rel_l2": self.best_val,
                       "seed": self.seed}, f)

    # ------------------------------------------------------------------
    def validate(self, epoch, batch_size: int = 8):
        """Full autoregressive rollout eval: frame-wise and sequence-wise
        relative L2 on denormalized fields (train_stage2_ns2d.py:238-293)."""
        cfg = self.cfg
        ev = self.val_ds.eval_trajectories()
        if self.conditional:
            x0, y, cond_all = ev
        else:
            x0, y = ev
            cond_all = None
        n, steps = y.shape[0], y.shape[1]

        if steps not in self._predict_cache:
            # optional `decode_chunk:` config key — chunk the fused
            # rollout's batched decode (numerically identical; measured
            # optimum 116 frames for NS2d-scale decodes, BASELINE.md)
            dc = getattr(self.cfg, "decode_chunk", None)
            if self.conditional:
                self._predict_cache[steps] = jax.jit(
                    lambda p, x, c: self.model.predict(p, x, steps, cond=c, to_x=True,
                                                       decode_chunk=dc)
                )
            else:
                self._predict_cache[steps] = jax.jit(
                    lambda p, x: self.model.predict(p, x, steps, to_x=True,
                                                    decode_chunk=dc)
                )
        predict = self._predict_cache[steps]

        frame_errs, seq_errs = [], []
        sample_pred = sample_gt = None
        params = self.params
        for i in range(0, n, batch_size):
            xb = jnp.asarray(x0[i : i + batch_size, 0])  # [b, h, w, c]
            yb = y[i : i + batch_size]
            if self.conditional:
                cb = jnp.asarray(cond_all[i : i + batch_size])
                yhat = predict(params, xb, cb)
            else:
                yhat = predict(params, xb)
            yhat_d = np.asarray(self.val_ds.denormalize(yhat))
            y_d = np.asarray(self.val_ds.denormalize(jnp.asarray(yb)))
            # [b, t, h, w, c]: frame-wise over (h, w); sequence-wise over (t, h, w)
            frame_errs.append(np.asarray(relative_lp_loss(
                jnp.asarray(yhat_d), jnp.asarray(y_d), reduce_dim=(2, 3), p=2)))
            seq_errs.append(np.asarray(relative_lp_loss(
                jnp.asarray(yhat_d), jnp.asarray(y_d), reduce_dim=(1, 2, 3), p=2)))
            if sample_pred is None:
                sample_pred, sample_gt = yhat_d, y_d

        frame_err = np.concatenate(frame_errs)  # [n, t, c]
        seq_err = np.concatenate(seq_errs)      # [n, c]
        seq_mean = seq_err.mean(axis=0)
        print(f"Averaged sequence-wise relative loss: {seq_mean}")
        metrics = {"val_seq_rel_l2": float(seq_mean.mean())}

        sdir = os.path.join(cfg.log_dir, "samples")
        stride = max(1, steps // 6)
        nshow = min(4, sample_pred.shape[0])
        names = CHANNEL_NAMES.get(cfg.workload, ())
        if len(names) > 1:
            # per-channel sequence-wise losses + per-channel sample/gt grids
            # (reference train_stage2_SW.py:264-287 logs val_pred_loss_vx/
            # vy/prs scalars and sample_vx_*.png etc. grids)
            for c, name in enumerate(names):
                print(f"Averaged sequence-wise relative loss on {name}: "
                      f"{seq_mean[c]}")
                metrics[f"val_pred_loss_{name}"] = float(seq_mean[c])
                spath_c = os.path.join(sdir, f"sample_{name}_{epoch}.png")
                gpath_c = os.path.join(sdir, f"gt_{name}_{epoch}.png")
                log_sequence(sample_pred[:nshow, ::stride, :, :, c], spath_c)
                log_sequence(sample_gt[:nshow, ::stride, :, :, c], gpath_c)
                self.logger.log_image(f"sample_{name}", spath_c)
        self.logger.log(metrics, echo=False)
        spath = os.path.join(sdir, f"sample_{epoch}.png")
        log_sequence(sample_pred[:nshow, ::stride, :, :, 0], spath)
        log_sequence(sample_gt[:nshow, ::stride, :, :, 0],
                     os.path.join(sdir, f"gt_{epoch}.png"))
        cpath = os.path.join(sdir, f"err_curve_{epoch}.png")
        plot_error_curve(frame_err.mean(axis=(0, 2)), frame_err.std(axis=0).mean(-1),
                         cpath)
        # the reference pushes the eval figures to wandb as Images
        # (train_stage2_ns2d.py:277-291)
        self.logger.log_image("val_error_curve", cpath)
        self.logger.log_image("sample", spath)
        return float(seq_mean.mean())

    def save(self, epoch):
        ckpt = os.path.join(self.cfg.log_dir, "checkpoints")
        if self._ckptr is not None:
            self._ckptr.save(os.path.join(ckpt, f"model_{epoch}"), self.params)
        else:
            save_pytree(self.params, os.path.join(ckpt, f"model_{epoch}.msgpack"))
        save_pytree(self.opt_state, os.path.join(ckpt, f"optim_{epoch}.msgpack"))
        next_epoch = self.cfg.epochs if epoch == "final" else int(epoch)
        with open(os.path.join(ckpt, f"meta_{epoch}.json"), "w") as f:
            json.dump({"epoch": next_epoch, "seed": self.seed,
                       "best_val": None if self.best_val == float("inf")
                       else self.best_val,
                       "best_epoch": self.best_epoch}, f)

    def load(self, model_path: str):
        """Resume from a saved model: optimizer state (when present) restores
        the cosine-LR step count; the meta sidecar restores the epoch counter
        so `train()` continues from epoch k rather than replaying."""
        from lns_tpu.train.checkpoint import load_pytree

        params = load_latent_dynamics_checkpoint(self.cfg, model_path, self.params)
        self.ae_params = params["vq_ae"]
        self.prop_params = params["propagator"]
        optim_path = model_path.rstrip("/").replace("model_", "optim_")
        if not optim_path.endswith(".msgpack"):
            optim_path += ".msgpack"  # async saves name the model as a bare dir
        if model_path != optim_path and os.path.exists(optim_path):
            self.opt_state = load_pytree(self.opt_state, optim_path)
        meta_path = model_path.rstrip("/").replace("model_", "meta_")
        meta_path = os.path.splitext(meta_path)[0] + ".json"
        if meta_path != model_path and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.start_epoch = int(meta["epoch"])
            # keep the deterministic (seed, epoch, step) order/noise stream
            if "seed" in meta:
                self.seed = int(meta["seed"])
            # don't let a resumed run overwrite model_best with a worse one
            if meta.get("best_val") is not None:
                self.best_val = float(meta["best_val"])
                self.best_epoch = meta.get("best_epoch")
        # the train steps close over ae_params; rebuild BOTH (a stale
        # _train_step_dev would silently train through the pre-resume AE)
        self._train_step = self._build_train_step()
        if self.device_data:
            self._train_step_dev = self._build_train_step(gather=True)
