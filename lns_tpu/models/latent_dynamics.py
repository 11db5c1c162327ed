"""Latent dynamics: frozen autoencoder + trainable latent propagator.

The reference's LatentDynamics (train_stage2_ns2d.py:90-158) runs the
rollout as a Python loop, decoding inside the loop at every eval step. Here
the rollout is a single `lax.scan` inside one jitted program — latents stay
resident in HBM; decoding is batched over (batch x time) after the scan so
the decoder's convs see large MXU-friendly batches. This fused
encode -> scan -> batched-decode program is the benchmark kernel
(BASELINE.md throughput target).

Parameter layout: {'vq_ae': ..., 'propagator': ...}; stage-2 training takes
gradients w.r.t. the propagator subtree only (the AE is frozen, matching
requires_grad=False + eval in the reference, train_stage2_ns2d.py:107-114).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from lns_tpu.models.autoencoder import SimpleAutoencoder
from lns_tpu.models.propagator import build_propagator
from lns_tpu.ops.losses import smooth_l1_loss


class LatentDynamics:
    """Functional wrapper pairing an AE apply-fn with a propagator apply-fn.

    All methods are pure in (params, inputs) and jit-safe. `steps` counts are
    static (rollout lengths are fixed per workload).
    """

    def __init__(self, cfg, dtype=None, ae_dtype=None):
        self.cfg = cfg
        self.dtype = dtype
        self.ae = SimpleAutoencoder(cfg, dtype=ae_dtype)
        self.propagator = build_propagator(cfg, dtype=dtype)
        self.conditional = cfg.is_conditional

    # -- init ---------------------------------------------------------------
    def init(self, key, x_shape):
        """Initialize both subtrees. x_shape: [b, h, w, c] field shape."""
        k1, k2 = jax.random.split(key)
        x = jnp.zeros(x_shape, jnp.float32)
        ae_vars = self.ae.init(k1, x)
        z = self.ae.apply(ae_vars, x, method=SimpleAutoencoder.encode)
        if self.conditional:
            param = jnp.zeros((x_shape[0],), jnp.float32)
            prop_vars = self.propagator.init(k2, z, param)
        else:
            prop_vars = self.propagator.init(k2, z)
        return {
            "params": {
                "vq_ae": ae_vars["params"],
                "propagator": prop_vars["params"],
            }
        }

    # -- pieces -------------------------------------------------------------
    @staticmethod
    def _p(params):
        """Accept either the bare {'vq_ae', 'propagator'} tree or a
        {'params': ...}-wrapped variable dict."""
        return params["params"] if "params" in params else params

    def encode(self, params, x):
        return self.ae.apply(
            {"params": self._p(params)["vq_ae"]}, x, method=SimpleAutoencoder.encode
        )

    def decode(self, params, z):
        return self.ae.apply(
            {"params": self._p(params)["vq_ae"]}, z, method=SimpleAutoencoder.decode
        )

    def propagate(self, params, z, cond=None):
        prop = {"params": self._p(params)["propagator"]}
        if self.conditional:
            return self.propagator.apply(prop, z, cond)
        return self.propagator.apply(prop, z)

    # -- training rollout ---------------------------------------------------
    def rollout_loss(self, params, z_in, z_out, cond=None, loss_fn=smooth_l1_loss,
                     remat: Optional[bool] = None):
        """Pure latent rollout training loss (reference forward,
        train_stage2_ns2d.py:126-141): feed predictions back `t_out` times,
        smooth-L1 against precomputed latent targets. Full BPTT through the
        scan (t_out <= 5 in all shipped configs — unrolled).

        With `remat` (or cfg.remat) the propagator step is rematerialized in
        the backward pass — trades ~1 extra forward per step for O(1)
        activation memory in the rollout length, for long-horizon BPTT.

        z_in: [b, 1, h, w, c]; z_out: [b, t_out, h, w, c].
        """
        t_out = z_out.shape[1]
        z = z_in[:, 0]  # squeeze only the time axis (fixes reference defect
        # 2.10-11: z_in.squeeze() broke batch-size-1)
        if self.dtype is not None:
            # the scan carry must match the propagator's compute dtype
            # (e.g. f32 latents entering a bf16 mixed-precision rollout)
            z = z.astype(self.dtype)
        use_remat = bool(self.cfg.remat) if remat is None else remat

        def step_fn(carry):
            return self.propagate(params, carry, cond)

        if use_remat:
            step_fn = jax.checkpoint(step_fn)

        def step(carry, _):
            z_new = step_fn(carry)
            return z_new, z_new

        _, z_pred = lax.scan(step, z, None, length=t_out,
                             unroll=not use_remat)
        z_pred = jnp.moveaxis(z_pred, 0, 1)  # [b, t_out, ...]
        # loss always in f32 (mixed-precision rollouts produce bf16 preds)
        return loss_fn(z_pred.astype(jnp.float32), z_out.astype(jnp.float32))

    # -- fused autoregressive inference -------------------------------------
    def _pallas_rollout_ok(self, use_pallas: Optional[bool]) -> bool:
        """The fused Pallas rollout applies to non-conditional SimpleCNN
        propagators with wrap-dominated padding (circular/half-periodic).
        zeros-mode (two-phase) measured SLOWER in the kernel (9 masked conv
        taps on a 7x15 grid) so it stays on the XLA scan."""
        from lns_tpu.models.propagator import SimpleCNN
        from lns_tpu.pallas_kernels import backend as pl_backend

        if not (isinstance(self.propagator, SimpleCNN)
                and not self.conditional
                and self.propagator.padding_mode in
                ("circular", "half_periodic_x", "half_periodic_y")):
            return False
        return pl_backend.rollout_enabled() if use_pallas is None \
            else use_pallas

    def predict_latents(self, params, x, steps: int, cond=None,
                        unroll: int = 8, use_pallas: Optional[bool] = None,
                        pallas_interpret: bool = False):
        """Encode once, roll the propagator `steps` times; returns
        [b, steps, h, w, c] latents.

        On a single TPU device with a supported propagator the rollout runs
        as ONE fused Pallas program (pallas_kernels/prop_rollout.py): the
        per-step propagator is ~35 tiny XLA kernels on a <=12x24 latent
        grid, so the scan is kernel-launch-bound — the fused kernel keeps
        the carry and all weights VMEM-resident across steps (NS2d 29-step
        scan 2.1 -> 1.4 ms; SW 42-step 6.0 -> 3.7 ms). Numerics match the
        XLA scan to bf16 rounding per step (divergence over a rollout is
        Lyapunov amplification of rounding, same magnitude as XLA-bf16 vs
        f32). Elsewhere it is a partially-unrolled `lax.scan`."""
        z0 = self.encode(params, x)
        if self.dtype is not None:
            z0 = z0.astype(self.dtype)  # carry dtype == propagator dtype

        if self._pallas_rollout_ok(use_pallas):
            from lns_tpu.pallas_kernels import prop_rollout as _pr

            packed = _pr.pack_simple_cnn_params(
                self._p(params)["propagator"], self.propagator.prop_n_block,
                dtype=self.dtype or jnp.float32)
            zs = _pr.fused_rollout(
                z0, packed, steps=steps,
                n_block=self.propagator.prop_n_block,
                dilation=self.propagator.dilation,
                padding_mode=self.propagator.padding_mode,
                interpret=pallas_interpret)
            return jnp.moveaxis(zs, 0, 1)

        def step(carry, _):
            z_new = self.propagate(params, carry, cond)
            return z_new, z_new

        _, zs = lax.scan(step, z0, None, length=steps,
                         unroll=min(unroll, steps))
        return jnp.moveaxis(zs, 0, 1)

    def predict(self, params, x, steps: int, cond=None, to_x: bool = True,
                decode_chunk: Optional[int] = None,
                use_pallas: Optional[bool] = None,
                pallas_interpret: bool = False,
                decode_unroll: bool = False):
        """Full fused rollout: encode -> scan -> batched decode.

        Mathematically identical to the reference's decode-every-step loop
        (train_stage2_ns2d.py:143-158) but the decode runs over the flattened
        (batch*steps) axis in one (or a few chunked) passes — large batches
        for the MXU instead of `steps` tiny launches.

        `decode_unroll` replaces the chunk `lax.map` with a Python loop over
        chunks: XLA schedules across chunk boundaries (no while-loop
        barrier/bookkeeping between chunks) at the cost of a program that
        is n_chunks x larger to compile.
        """
        zs = self.predict_latents(params, x, steps, cond,
                                  use_pallas=use_pallas,
                                  pallas_interpret=pallas_interpret)
        if not to_x:
            return zs
        b, t = zs.shape[:2]
        zflat = zs.reshape((b * t,) + zs.shape[2:])
        if decode_chunk is None:
            yflat = self.decode(params, zflat)
        else:
            n = b * t
            pad = (-n) % decode_chunk
            zpad = jnp.pad(zflat, [(0, pad)] + [(0, 0)] * (zflat.ndim - 1))
            chunks = zpad.reshape((-1, decode_chunk) + zflat.shape[1:])
            if decode_unroll:
                yflat = jnp.concatenate(
                    [self.decode(params, chunks[i])
                     for i in range(chunks.shape[0])], axis=0)[:n]
            else:
                yflat = lax.map(lambda c: self.decode(params, c), chunks)
                yflat = yflat.reshape((-1,) + yflat.shape[2:])[:n]
        return yflat.reshape((b, t) + yflat.shape[1:])
