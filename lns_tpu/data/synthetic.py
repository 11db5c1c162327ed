"""Synthetic dataset fabricators (tests, benchmarks, smoke runs).

Generates tiny corpora in the exact on-disk formats the loaders consume:
NS2d-style npz, tank-sloshing npz directories, and shallow-water zarr/npz
stores + normstats. Fields are smooth random Fourier mixtures so stage-1
training can actually reduce loss in integration tests.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from lns_tpu.data.zarr_reader import write_zarr_array


def _smooth_field(rng, t, h, w, k=4):
    """Smooth space-time field via a few random Fourier modes."""
    ty, tx = np.meshgrid(np.linspace(0, 2 * np.pi, h, endpoint=False),
                         np.linspace(0, 2 * np.pi, w, endpoint=False), indexing="ij")
    out = np.zeros((t, h, w), np.float32)
    for _ in range(k):
        ky, kx = rng.integers(1, 4, 2)
        amp = rng.normal(0, 1)
        ph = rng.uniform(0, 2 * np.pi)
        om = rng.uniform(0.1, 0.5)
        for ti in range(t):
            out[ti] += amp * np.sin(ky * ty + kx * tx + ph + om * ti)
    return out


def make_ns2d_npz(path: str, ncase: int = 8, case_len: int = 6, h: int = 32, w: int = 32,
                  seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    sol = np.stack([_smooth_field(rng, case_len, h, w) for _ in range(ncase)], axis=-1)
    # keys per dataset/ns2d_fno_stage1.py: [T, H, W, Ncase]
    np.savez(path, all_sol_center=sol, all_sol_forward=sol, all_sol_backward=sol)
    return path


def make_twophase_dir(path: str, ncase: int = 8, case_len: int = 6, h: int = 61, w: int = 121,
                      seed: int = 0, with_freq: bool = True) -> str:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(ncase):
        vel = np.stack(
            [_smooth_field(rng, case_len, h, w), _smooth_field(rng, case_len, h, w)], axis=-1
        )
        prs = _smooth_field(rng, case_len, h, w)
        vof = np.clip(0.5 + 0.5 * _smooth_field(rng, case_len, h, w), 0, 1)
        kw = dict(vel=vel, prs=prs, vof=vof)
        if with_freq:
            kw["freq"] = np.float32(rng.uniform(0.5, 2.0))
        np.savez(os.path.join(path, f"case_{i:04d}.npz"), **kw)
    return path


def make_sw_store(dirpath: str, ncase: int = 6, case_len: int = 8, h: int = 32, w: int = 64,
                  seed: int = 0, fmt: str = "zarr") -> Tuple[str, str, str]:
    """Create train/test stores + normstats; returns their three paths."""
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)

    def corpus(n):
        u = np.stack([_smooth_field(rng, case_len, h, w) for _ in range(n)])
        v = np.stack([_smooth_field(rng, case_len, h, w) for _ in range(n)])
        p = np.stack([_smooth_field(rng, case_len, h, w) for _ in range(n)])
        return u, v, p

    paths = []
    for split, n in (("train", ncase), ("test", max(2, ncase // 3))):
        u, v, p = corpus(n)
        if fmt == "zarr":
            store = os.path.join(dirpath, f"{split}.zarr")
            os.makedirs(store, exist_ok=True)
            write_zarr_array(os.path.join(store, "u"), u, chunks=(1, case_len, h, w))
            write_zarr_array(os.path.join(store, "v"), v, chunks=(1, case_len, h, w))
            write_zarr_array(os.path.join(store, "pres"), p, chunks=(1, case_len, h, w))
        else:
            store = os.path.join(dirpath, f"{split}.npz")
            np.savez(store, u=u, v=v, pres=p)
        paths.append(store)
        if split == "train":
            stats = {}
            for name, arr in (("u", u), ("v", v), ("pres", p)):
                stats[f"{name}_mean"] = np.float32(arr.mean())
                stats[f"{name}_std"] = np.float32(arr.std())
            stat_path = os.path.join(dirpath, "normstats.npz")
            np.savez(stat_path, **stats)
    return paths[0], paths[1], stat_path


def synthetic_config(workload: str, tmpdir: str, **overrides):
    """A tiny runnable Config for the given workload, with data on disk."""
    from lns_tpu.config import Config

    if workload == "ns2d":
        data = make_ns2d_npz(os.path.join(tmpdir, "ns2d.npz"), h=32, w=32)
        base = dict(
            latent_dim=8, Ly=32, Lx=32, resolution=32, in_channels=1,
            latent_resolution=8, is_periodic=True,
            encoder_channels=[32, 32, 64, 64], fourier_resolutions=[],
            encoder_res_blocks=1, use_attn_enc=False,
            use_fa=True, decoder_channels=[64, 64, 32], attn_resolutions=[16],
            decoder_res_blocks=1, final_smoothing=False, attn_heads=4, attn_dim=16,
            disable_coarse_attn=False, noise_level=0.0,
            data_dir=data, case_len=6, dataset_stat=os.path.join(tmpdir, "ns2d_stat.npz"),
            num_case=8, interval=1, out_tw=2, in_tw=1,
            batch_size=4, epochs=1, learning_rate=3e-4, beta1=0.5, beta2=0.9,
            ckpt_every=1, log_dir=os.path.join(tmpdir, "log_ns2d"),
            overwrite_exist=True, prop_n_block=2, prop_n_embd=32, dilation=2,
        )
    elif workload == "sw":
        train, test, stats = make_sw_store(os.path.join(tmpdir, "sw"), fmt="zarr")
        base = dict(
            latent_dim=16, Ly=32, Lx=64, resolutions=[32, 64], in_channels=3,
            latent_resolution=8, periodic_direction="x", hw_ratio=2,
            encoder_channels=[32, 32, 64, 64], fourier_resolutions=[],
            encoder_res_blocks=1, use_fa=True, decoder_channels=[64, 64, 32],
            attn_resolutions=[16], decoder_res_blocks=1, final_smoothing=False,
            decoder_attn_heads=4, decoder_attn_dim=16, disable_coarse_attn=False,
            train_data_dir=train, test_data_dir=test, dataset_stat=stats,
            case_len=8, num_case=6, out_tw=2, batch_size=4, epochs=1,
            learning_rate=3e-4, beta1=0.5, beta2=0.9, ckpt_every=1,
            log_dir=os.path.join(tmpdir, "log_sw"), overwrite_exist=True,
            prop_n_block=2, prop_n_embd=32, dilation=2,
        )
    elif workload in ("twophase", "twophase_conditional"):
        data = make_twophase_dir(os.path.join(tmpdir, "tank"), h=31, w=61,
                                 with_freq=True)
        base = dict(
            latent_dim=16, Ly=31, Lx=61, resolutions=[31, 61], in_channels=4,
            latent_resolution=7, is_periodic=False, hw_ratio=2,
            encoder_channels=[32, 32, 64, 64], fourier_resolutions=[],
            encoder_res_blocks=1, use_fa=True, decoder_channels=[64, 64, 32],
            attn_resolutions=[15], decoder_res_blocks=1, final_smoothing=False,
            decoder_attn_heads=4, decoder_attn_dim=16, disable_coarse_attn=False,
            data_dir=data, case_len=6, dataset_stat=os.path.join(tmpdir, "tank_stat.npz"),
            num_case=8, in_tw=1, out_tw=2, batch_size=4, epochs=1,
            learning_rate=3e-4, beta1=0.5, beta2=0.9, ckpt_every=1,
            log_dir=os.path.join(tmpdir, "log_tank"), overwrite_exist=True,
            prop_n_block=2, prop_n_embd=32, dilation=2,
        )
        if workload == "twophase_conditional":
            base["cond_channels"] = 1
            base["cond_emb_channels"] = 16
    else:
        raise ValueError(workload)
    base.update(overrides)
    return Config(base)
