"""Checkpoint conversion CLI (both directions).

    # reference torch -> native msgpack
    python -m lns_tpu.cli.convert --config cfg.yml --input vqgan_epoch_final.pt \
        --output ae.msgpack [--kind ae|dynamics]

    # native msgpack -> reference torch (strict-loadable by the reference)
    python -m lns_tpu.cli.convert --config cfg.yml --input ae.msgpack \
        --output ae.pt --kind ae
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind", choices=["ae", "dynamics"], default="ae")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lns_tpu.config import load_config
    from lns_tpu.train.checkpoint import load_pytree, save_pytree

    cfg = load_config(args.config)

    if args.input.endswith(".pt"):
        from lns_tpu.utils.torch_compat import (
            convert_autoencoder,
            convert_latent_dynamics,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.input)
        params = (
            convert_autoencoder(cfg, sd)
            if args.kind == "ae"
            else convert_latent_dynamics(cfg, sd)
        )
        save_pytree(params, args.output)
        print(f"wrote {args.output} ({args.kind}, torch -> msgpack)")
    else:
        from lns_tpu.models import LatentDynamics, SimpleAutoencoder
        from lns_tpu.utils.torch_export import (
            export_autoencoder,
            export_latent_dynamics,
            save_torch_checkpoint,
        )

        field = (
            (cfg.resolution, cfg.resolution)
            if cfg.resolutions is None
            else tuple(cfg.resolutions)
        )
        if args.kind == "ae":
            ae = SimpleAutoencoder(cfg)
            template = ae.init(
                jax.random.PRNGKey(0), jnp.zeros((1, *field, cfg.in_channels))
            )["params"]
            params = load_pytree(template, args.input)
            state = export_autoencoder(cfg, params)
        else:
            model = LatentDynamics(cfg)
            template = model.init(
                jax.random.PRNGKey(0), (1, *field, cfg.in_channels)
            )["params"]
            params = load_pytree(template, args.input)
            state = export_latent_dynamics(cfg, params)
        save_torch_checkpoint(state, args.output)
        print(f"wrote {args.output} ({args.kind}, msgpack -> torch)")


if __name__ == "__main__":
    main()
