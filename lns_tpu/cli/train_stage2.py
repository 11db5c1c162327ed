"""Stage-2 training entry point: dispatches on the config's workload
(including the conditional two-phase variant).

    python -m lns_tpu.cli.train_stage2 --config configs/ns2d_stage2_prop.yml
"""

from __future__ import annotations


def main():
    from lns_tpu.cli.common import build_mesh, parse_args

    args, cfg = parse_args(__doc__)
    from lns_tpu.train import Stage2Trainer

    trainer = Stage2Trainer(
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
