"""Standalone rollout evaluation: load a stage-2 checkpoint (native
.msgpack or reference torch .pt) and report frame-wise / sequence-wise
relative-L2 over the full autoregressive rollout on the held-out split.

    python -m lns_tpu.cli.evaluate --config configs/ns2d_stage2_prop.yml \
        --checkpoint experiments/.../model_final.msgpack [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="stage-2 model checkpoint (.msgpack or reference .pt)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--decode-chunk", type=int, default=None,
                   help="chunk the fused rollout's batched decode into "
                        "this many frames per lax.map step (numerically "
                        "identical; see BASELINE.md batch-scaling notes)")
    p.add_argument("--out", type=str, default=None, help="write metrics JSON here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lns_tpu.config import load_config
    from lns_tpu.models import LatentDynamics
    from lns_tpu.ops.losses import relative_lp_loss
    from lns_tpu.train.checkpoint import load_latent_dynamics_checkpoint
    from lns_tpu.train.stage2 import STAGE2_DATASETS

    cfg = load_config(args.config)
    model = LatentDynamics(cfg)
    val_ds = STAGE2_DATASETS[cfg.workload](cfg, train_mode=False)

    ev = val_ds.eval_trajectories()
    cond_all = None
    if cfg.is_conditional:
        x0, y, cond_all = ev
    else:
        x0, y = ev
    steps = y.shape[1]

    template = model.init(jax.random.PRNGKey(0), (1,) + x0.shape[2:])["params"]
    params = load_latent_dynamics_checkpoint(cfg, args.checkpoint, template)

    dc = args.decode_chunk if args.decode_chunk is not None \
        else getattr(cfg, "decode_chunk", None)
    predict = jax.jit(lambda p, x, c: model.predict(p, x, steps, cond=c, to_x=True,
                                                    decode_chunk=dc)) \
        if cfg.is_conditional else \
        jax.jit(lambda p, x: model.predict(p, x, steps, to_x=True, decode_chunk=dc))

    frame_errs, seq_errs = [], []
    for i in range(0, x0.shape[0], args.batch_size):
        xb = jnp.asarray(x0[i : i + args.batch_size, 0])
        yb = jnp.asarray(y[i : i + args.batch_size])
        if cfg.is_conditional:
            yhat = predict(params, xb, jnp.asarray(cond_all[i : i + args.batch_size]))
        else:
            yhat = predict(params, xb)
        yhat_d = val_ds.denormalize(yhat)
        y_d = val_ds.denormalize(yb)
        frame_errs.append(np.asarray(relative_lp_loss(yhat_d, y_d, reduce_dim=(2, 3), p=2)))
        seq_errs.append(np.asarray(relative_lp_loss(yhat_d, y_d, reduce_dim=(1, 2, 3), p=2)))

    frame_err = np.concatenate(frame_errs)
    seq_err = np.concatenate(seq_errs)
    metrics = {
        "rollout_steps": int(steps),
        "num_trajectories": int(x0.shape[0]),
        "seq_rel_l2_per_channel": seq_err.mean(axis=0).tolist(),
        "seq_rel_l2": float(seq_err.mean()),
        "frame_rel_l2_vs_time": frame_err.mean(axis=(0, 2)).tolist(),
    }
    # surface the training run's best-val record next to whatever checkpoint
    # was scored, so "final vs best" is visible in one report
    import os

    bmeta = os.path.join(os.path.dirname(args.checkpoint), "meta_best.json")
    if os.path.exists(bmeta):
        with open(bmeta) as f:
            metrics["training_best_checkpoint"] = json.load(f)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
