"""CLI end-to-end (evaluate) and converter-strictness tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from lns_tpu.config import Config
from lns_tpu.data.synthetic import synthetic_config
from lns_tpu.train import Stage1Trainer, Stage2Trainer


def test_converter_strict_accounting():
    """Missing and extra torch keys must fail loudly."""
    from lns_tpu.utils.torch_compat import _Reader, convert_propagator

    cfg = Config(latent_dim=8, prop_n_block=1, prop_n_embd=32, dilation=2,
                 resolution=16, is_periodic=True)
    # build a correct fake state dict via torch
    import torch

    sd = {
        "in_proj.weight": torch.zeros(32, 8, 1, 1).numpy(),
        "in_proj.bias": torch.zeros(32).numpy(),
        "net.0.conv.0.weight": torch.zeros(32).numpy(),
        "net.0.conv.0.bias": torch.zeros(32).numpy(),
        "net.0.conv.1.weight": torch.zeros(32, 32, 3, 3).numpy(),
        "net.0.conv.1.bias": torch.zeros(32).numpy(),
        "net.0.conv.3.weight": torch.zeros(32, 32, 3, 3).numpy(),
        "net.0.conv.3.bias": torch.zeros(32).numpy(),
        "net.0.conv.5.weight": torch.zeros(32, 32, 3, 3).numpy(),
        "net.0.conv.5.bias": torch.zeros(32).numpy(),
        "net.0.ffn.0.weight": torch.zeros(32).numpy(),
        "net.0.ffn.0.bias": torch.zeros(32).numpy(),
        "net.0.ffn.1.weight": torch.zeros(32, 32, 1, 1).numpy(),
        "net.0.ffn.3.weight": torch.zeros(32, 32, 1, 1).numpy(),
        "out_proj.0.gn.weight": torch.zeros(32).numpy(),
        "out_proj.0.gn.bias": torch.zeros(32).numpy(),
        "out_proj.1.weight": torch.zeros(8, 32, 1, 1).numpy(),
        "out_proj.1.bias": torch.zeros(8).numpy(),
    }
    out = convert_propagator(cfg, dict(sd), prefix="")
    assert "net0" in out

    missing = dict(sd)
    del missing["net.0.ffn.1.weight"]
    with pytest.raises(KeyError):
        convert_propagator(cfg, missing, prefix="")

    extra = dict(sd)
    extra["net.0.bogus"] = np.zeros(1)
    with pytest.raises(ValueError):
        convert_propagator(cfg, extra, prefix="")


def test_evaluate_cli(tmp_path):
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    t1 = Stage1Trainer(cfg, use_wandb=False)
    t1.save("final")
    cfg2 = cfg.replace(
        log_dir=str(tmp_path / "s2"),
        pretrained_checkpoint_path=os.path.join(cfg.log_dir, "checkpoints",
                                                "vqgan_epoch_final.msgpack"),
    )
    t2 = Stage2Trainer(cfg2, use_wandb=False)
    t2.save("final")

    # write the config to yaml for the CLI
    import yaml

    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg2.to_dict(), f)

    out_path = str(tmp_path / "metrics.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # drop the axon site hook so the subprocess really runs on CPU
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-m", "lns_tpu.cli.evaluate", "--config", cfg_path,
         "--checkpoint", os.path.join(cfg2.log_dir, "checkpoints", "model_final.msgpack"),
         "--out", out_path],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(out_path))
    assert "seq_rel_l2" in metrics and np.isfinite(metrics["seq_rel_l2"])
    assert len(metrics["frame_rel_l2_vs_time"]) == metrics["rollout_steps"]


def test_async_checkpointer_roundtrip(tmp_path):
    from lns_tpu.train.checkpoint import AsyncCheckpointer

    c = AsyncCheckpointer()
    tree = {"a": np.arange(6).reshape(2, 3).astype(np.float32),
            "b": {"c": np.ones(4, np.float32)}}
    path = str(tmp_path / "ckpt")
    c.save(path, tree)
    c.wait()
    back = c.restore(path, tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
