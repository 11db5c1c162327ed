#!/usr/bin/env python
"""End-to-end example: two-stage training on a synthetic NS2d corpus.

Fabricates a tiny dataset, trains the stage-1 autoencoder, then the stage-2
latent propagator, and reports the full-rollout relative-L2 — the complete
reference workflow at toy scale, runnable anywhere (CPU included):

    python examples/train_ns2d_synthetic.py [--epochs 5] [--workdir /tmp/lns]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import os
import tempfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--mesh", type=int, default=1, help="data-parallel devices (1 = off)")
    args = p.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="lns_ns2d_")
    os.makedirs(workdir, exist_ok=True)
    print(f"workdir: {workdir}")

    from lns_tpu.data.synthetic import synthetic_config
    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    mesh = None
    if args.mesh > 1:
        import jax

        from lns_tpu.parallel.mesh import data_mesh

        mesh = data_mesh(jax.devices()[: args.mesh])

    cfg1 = synthetic_config("ns2d", workdir, epochs=args.epochs)
    print("== stage 1: autoencoder")
    t1 = Stage1Trainer(cfg1, use_wandb=False, mesh=mesh)
    t1.train()

    cfg2 = cfg1.replace(
        log_dir=os.path.join(workdir, "stage2"),
        pretrained_checkpoint_path=os.path.join(
            cfg1.log_dir, "checkpoints", "vqgan_epoch_final.msgpack"
        ),
        learning_rate=5e-4,
        epochs=args.epochs,
    )
    print("== stage 2: latent propagator")
    t2 = Stage2Trainer(cfg2, use_wandb=False, mesh=mesh)
    t2.train()
    print("done; checkpoints + metrics under", workdir)


if __name__ == "__main__":
    main()
