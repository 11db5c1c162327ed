"""Data pipeline tests: formats, splits, windowing, zarr reader."""

import os

import numpy as np
import pytest

from lns_tpu.data.synthetic import (
    make_ns2d_npz,
    make_sw_store,
    make_twophase_dir,
    synthetic_config,
)
from lns_tpu.data import (
    ConditionalTankSloshingStage2,
    NS2DStage1,
    NS2DStage2,
    SWStage1,
    SWStage2,
    TankSloshingStage1,
    TankSloshingStage2,
    epoch_batches,
)
from lns_tpu.data.zarr_reader import open_zarr, write_zarr_array


def test_zarr_roundtrip(tmp_path):
    arr = np.random.default_rng(0).normal(size=(3, 5, 8, 16)).astype(np.float32)
    write_zarr_array(str(tmp_path / "a"), arr, chunks=(1, 5, 8, 16))
    back = open_zarr(str(tmp_path))["a"].read_all()
    np.testing.assert_array_equal(arr, back)


def test_zarr_ragged_chunks(tmp_path):
    arr = np.arange(7 * 5, dtype=np.float32).reshape(7, 5)
    write_zarr_array(str(tmp_path / "a"), arr, chunks=(3, 2))
    back = open_zarr(str(tmp_path))["a"].read_all()
    np.testing.assert_array_equal(arr, back)


def test_ns2d_split_matches_reference_formula(tmp_path):
    path = make_ns2d_npz(str(tmp_path / "d.npz"), ncase=20, case_len=4, h=8, w=8)
    from lns_tpu.config import Config

    cfg = Config(data_dir=path, case_len=4, dataset_stat=str(tmp_path / "s.npz"), num_case=20)
    tr = NS2DStage1(cfg, train_mode=True)
    te = NS2DStage1(cfg, train_mode=False)
    idxs = np.arange(20)
    np.random.seed(1)
    np.random.shuffle(idxs)
    np.testing.assert_array_equal(tr.idxs, idxs[:18])
    np.testing.assert_array_equal(te.idxs, idxs[18:])
    assert len(tr) == 18 * 4 and len(te) == 2


def test_ns2d_stage1_batches_and_denorm(tmp_path):
    path = make_ns2d_npz(str(tmp_path / "d.npz"), ncase=8, case_len=4, h=8, w=8)
    from lns_tpu.config import Config

    cfg = Config(data_dir=path, case_len=4, dataset_stat=str(tmp_path / "s.npz"), num_case=8)
    ds = NS2DStage1(cfg, train_mode=True)
    b = ds.get_batch(np.array([0, 5, 11]))
    assert b.shape == (3, 8, 8, 1)
    x = ds.denormalize(ds.normalize(ds.data[0, :, :, 0]))
    np.testing.assert_allclose(x, ds.data[0, :, :, 0], atol=1e-4)


def test_ns2d_stage2_windows(tmp_path):
    path = make_ns2d_npz(str(tmp_path / "d.npz"), ncase=8, case_len=6, h=8, w=8)
    from lns_tpu.config import Config

    cfg = Config(data_dir=path, case_len=6, dataset_stat=str(tmp_path / "s.npz"),
                 num_case=8, out_tw=2, interval=1)
    ds = NS2DStage2(cfg, train_mode=True)
    ds.encode_dataset(lambda x: x[:, ::2, ::2])  # fake encoder: [b,4,4,1]
    z_in, z_out = ds.get_batch(np.arange(4))
    assert z_in.shape == (4, 1, 4, 4, 1) and z_out.shape == (4, 2, 4, 4, 1)
    # window correctness: z_out directly follows z_in in the strided series
    case0 = ds.encoded[0]
    np.testing.assert_array_equal(z_in[0, 0], case0[0])
    np.testing.assert_array_equal(z_out[0], case0[1:3])


def test_twophase_dataset(tmp_path):
    d = make_twophase_dir(str(tmp_path / "tank"), ncase=6, case_len=5, h=13, w=17)
    from lns_tpu.config import Config

    cfg = Config(data_dir=d, case_len=5, dataset_stat=str(tmp_path / "s.npz"), num_case=6,
                 in_tw=1, out_tw=2)
    ds = TankSloshingStage1(cfg, train_mode=True)
    b = ds.get_batch(np.array([0, 7]))
    assert b.shape == (2, 13, 17, 4)
    # denormalize imposes Dirichlet walls + clamps vof
    dn = np.asarray(ds.denormalize(b))
    assert np.all(dn[:, 0, :, :2] == 0) and np.all(dn[:, -1, :, :2] == 0)
    assert np.all(dn[:, :, 0, :2] == 0) and np.all(dn[:, :, -1, :2] == 0)
    assert dn[..., 3].min() >= 0 and dn[..., 3].max() <= 1 + 1e-6

    ds2 = TankSloshingStage2(cfg, train_mode=True)
    ds2.encode_dataset(lambda x: x[:, ::2, ::2])
    z_in, z_out = ds2.get_batch(np.arange(3))
    assert z_in.shape[1] == 1 and z_out.shape[1] == 2


def test_conditional_twophase(tmp_path):
    d = make_twophase_dir(str(tmp_path / "tank"), ncase=6, case_len=5, h=13, w=17)
    from lns_tpu.config import Config

    cfg = Config(data_dir=d, case_len=5, dataset_stat=str(tmp_path / "s.npz"), num_case=6,
                 in_tw=1, out_tw=2, cond_channels=1)
    ds = ConditionalTankSloshingStage2(cfg, train_mode=True)
    ds.encode_dataset(lambda x: x[:, ::2, ::2])
    z_in, z_out, p = ds.get_batch(np.arange(3))
    assert p.shape == (3,)
    assert np.all(p >= 0) and np.all(p <= 1)


def test_sw_dataset_zarr_and_npz(tmp_path):
    from lns_tpu.config import Config

    for fmt in ("zarr", "npz"):
        train, test, stats = make_sw_store(str(tmp_path / fmt), ncase=4, case_len=8,
                                           h=8, w=16, fmt=fmt)
        cfg = Config(train_data_dir=train, test_data_dir=test, dataset_stat=stats,
                     case_len=8, num_case=4, out_tw=2)
        ds = SWStage1(cfg, train_mode=True)
        b = ds.get_batch(np.array([0, 3]))
        assert b.shape == (2, 8, 16, 3)
        ds2 = SWStage2(cfg, train_mode=True)
        ds2.encode_dataset(lambda x: x[:, ::2, ::2])
        z_in, z_out = ds2.get_batch(np.arange(2))
        assert z_in.shape[1] == 1 and z_out.shape[1] == 2
        # interval-2 stride: z_out[0] two encoded frames after z_in
        case, start = 0, ds2._start(np.array([0]))[0]
        np.testing.assert_array_equal(z_in[0, 0], ds2.encoded[0, start])
        np.testing.assert_array_equal(z_out[0, 0], ds2.encoded[0, start + 2])


def test_epoch_batches():
    rng = np.random.default_rng(0)
    batches = list(epoch_batches(10, 4, rng, drop_last=True))
    assert [len(b) for b in batches] == [4, 4]
    batches = list(epoch_batches(10, 4, rng, drop_last=False))
    assert [len(b) for b in batches] == [4, 4, 2]
    all_idx = np.concatenate(batches)
    assert sorted(all_idx) == list(range(10))


def test_pixel_space_twins(tmp_path):
    """SW2DDataSimple / (Conditional)SimpleTankSloshingData equivalents."""
    from lns_tpu.config import Config
    from lns_tpu.data import (
        ConditionalSimpleTankSloshingData,
        SimpleTankSloshingData,
        SW2DDataSimple,
    )

    d = make_twophase_dir(str(tmp_path / "tank"), ncase=6, case_len=5, h=13, w=17)
    cfg = Config(data_dir=d, case_len=5, dataset_stat=str(tmp_path / "s.npz"),
                 num_case=6, in_tw=1, out_tw=2, cond_channels=1)
    ds = SimpleTankSloshingData(cfg, train_mode=True)
    x_in, x_out = ds.get_batch(np.arange(3))
    assert x_in.shape == (3, 1, 13, 17, 4) and x_out.shape == (3, 2, 13, 17, 4)

    dsc = ConditionalSimpleTankSloshingData(cfg, train_mode=True)
    x_in, x_out, p = dsc.get_batch(np.arange(3))
    assert p.shape == (3,)

    train, test, stats = make_sw_store(str(tmp_path / "sw"), ncase=4, case_len=10,
                                       h=8, w=16, fmt="npz")
    cfg = Config(train_data_dir=train, test_data_dir=test, dataset_stat=stats,
                 case_len=10, num_case=4, out_tw=2)
    ds = SW2DDataSimple(cfg, train_mode=True)
    x_in, x_out = ds.get_batch(np.arange(2))
    assert x_in.shape == (2, 1, 8, 16, 3) and x_out.shape == (2, 2, 8, 16, 3)


def test_prefetch_to_device_order_and_lookahead():
    """prefetch_to_device yields every batch in order and stages `size`
    transfers ahead of the consumer."""
    from lns_tpu.data.prefetch import prefetch_to_device

    staged = []
    out = []
    gen = prefetch_to_device(iter(range(6)), lambda b: (staged.append(b), b)[1],
                             size=2)
    first = next(gen)
    # two batches staged before the first is consumed
    assert staged == [0, 1] and first == 0
    out = [first] + list(gen)
    assert out == list(range(6))
    assert staged == list(range(6))
