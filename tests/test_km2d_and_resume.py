"""KM2D dataset tests + stage-2 resume test."""

import os

import numpy as np
import pytest

from lns_tpu.config import Config


def test_km2d_datasets(tmp_path):
    from lns_tpu.data import KM2DStage1, KM2DStage2

    rng = np.random.default_rng(0)
    data = rng.normal(size=(6, 8, 256, 256)).astype(np.float32)
    path = str(tmp_path / "km.npy")
    np.save(path, data)

    cfg = Config(data_dir=path, resolution=64, case_len=8, train_num=4, test_num=2,
                 dataset_stat=str(tmp_path / "s.npz"), out_tw=2, interval=1)
    ds = KM2DStage1(cfg, train_mode=True)
    assert ds.data.shape == (4, 8, 64, 64)
    b = ds.get_batch(np.array([0, 9]))
    assert b.shape == (2, 64, 64, 1)
    te = KM2DStage1(cfg, train_mode=False)
    assert te.data.shape == (2, 8, 64, 64)
    # test split comes from the END of the corpus (km2d_stage1.py:30-31)
    np.testing.assert_allclose(te.data[0], data[4, :, ::4, ::4])

    ds2 = KM2DStage2(cfg, train_mode=True)
    ds2.encode_dataset(lambda x: x[:, ::8, ::8])
    z_in, z_out = ds2.get_batch(np.arange(3))
    assert z_in.shape == (3, 1, 8, 8, 1) and z_out.shape == (3, 2, 8, 8, 1)


def test_stage2_resume(tmp_path):
    from lns_tpu.data.synthetic import synthetic_config
    from lns_tpu.train import Stage1Trainer, Stage2Trainer

    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    t1 = Stage1Trainer(cfg, use_wandb=False)
    t1.save("final")
    ae_ckpt = os.path.join(cfg.log_dir, "checkpoints", "vqgan_epoch_final.msgpack")

    cfg2 = cfg.replace(log_dir=str(tmp_path / "s2"), pretrained_checkpoint_path=ae_ckpt)
    t2 = Stage2Trainer(cfg2, use_wandb=False)
    t2.save("5")
    model_ckpt = os.path.join(cfg2.log_dir, "checkpoints", "model_5.msgpack")

    cfg3 = cfg2.replace(log_dir=str(tmp_path / "s3"), resume_training=True,
                        resume_ckpt=model_ckpt)
    t3 = Stage2Trainer(cfg3, use_wandb=False)
    import jax

    for a, b in zip(jax.tree.leaves(t2.prop_params), jax.tree.leaves(t3.prop_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
