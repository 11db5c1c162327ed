"""Shared CLI plumbing: --config/--seed/--comment parsing (matching the
reference entry points, train_stage1_ns2d.py:151-165) plus TPU extras
(--mesh for data-parallel training, --no-wandb)."""

from __future__ import annotations

import argparse

import numpy as np

from lns_tpu.config import load_config


def parse_args(description: str):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, required=True, help="Path to the config file")
    p.add_argument("--seed", type=int, default=1234, help="Random seed")
    p.add_argument("--comment", type=str, default="", help="Comment")
    p.add_argument("--mesh", type=int, default=0,
                   help="Data-parallel mesh size (0 = all local devices, 1 = none)")
    p.add_argument("--no-wandb", action="store_true")
    args = p.parse_args()
    cfg = load_config(args.config)
    return args, cfg


def build_mesh(mesh_arg: int):
    import jax

    from lns_tpu.parallel.mesh import data_mesh

    if mesh_arg == 1:
        return None
    devices = jax.devices()
    if mesh_arg == 0:
        return data_mesh(devices) if len(devices) > 1 else None
    assert mesh_arg <= len(devices), f"requested mesh {mesh_arg} > {len(devices)} devices"
    return data_mesh(devices[:mesh_arg])
