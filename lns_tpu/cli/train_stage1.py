"""Stage-1 training entry point: dispatches on the config's workload.

    python -m lns_tpu.cli.train_stage1 --config configs/ns2d_stage1_ae.yml
"""

from __future__ import annotations


def main():
    from lns_tpu.cli.common import build_mesh, parse_args

    args, cfg = parse_args(__doc__)
    from lns_tpu.train import Stage1Trainer

    trainer = Stage1Trainer(
        cfg,
        seed=args.seed,
        mesh=build_mesh(args.mesh),
        use_wandb=not args.no_wandb,
        config_path=args.config,
    )
    trainer.train()
    print("Running finished...")


if __name__ == "__main__":
    main()
