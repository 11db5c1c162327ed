"""Two-phase tank-sloshing datasets (directory of per-case .npz).

Mirrors dataset/twophase_flow_stage1.py / twophase_flow_stage2.py: per-case
npz with vel [T, H, W, 2], prs [T, H, W], vof [T, H, W] (+ scalar `freq` for
the conditional variant); rows clipped to 61; seed-44 shuffled 90/10 split;
vel/prs global mean-std normalization with vof left in [0, 1]; denormalize
re-imposes Dirichlet walls (zero velocity on all four borders) and clamps
vof (twophase_flow_stage1.py:148-169).

Channels-last frames: [H, W, 4] = (vx, vy, prs, vof).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np


def _split_indices(num_case: int, available: int):
    idxs = np.arange(min(num_case, available))
    np.random.seed(44)  # deterministic, matching the reference
    np.random.shuffle(idxs)
    cut = int(0.9 * len(idxs))
    return idxs[:cut], idxs[cut:]


class _TankBase:
    conditional = False

    def __init__(self, cfg, train_mode: bool = True):
        self.cfg = cfg
        self.case_len = cfg.case_len
        self.train_mode = train_mode

        f_lst = sorted(f for f in os.listdir(cfg.data_dir) if f.endswith(".npz"))
        train_idx, test_idx = _split_indices(cfg.num_case, len(f_lst))
        self.idxs = train_idx if train_mode else test_idx

        fields = []
        params = []
        for i in self.idxs:
            d = np.load(os.path.join(cfg.data_dir, f_lst[i]))
            vel, prs, vof = d["vel"], d["prs"], d["vof"]
            if vel.shape[1] > 61:
                vel, prs, vof = vel[:, :61], prs[:, :61], vof[:, :61]
            assert self.case_len <= vel.shape[0]
            x = np.concatenate([vel, prs[..., None], vof[..., None]], axis=-1)
            fields.append(x[: self.case_len].astype(np.float32))
            if self.conditional:
                params.append(float(d["freq"]))
        # [N, T, H, W, 4] — the whole corpus fits in RAM (reference caches
        # all cases too, twophase_flow_stage1.py:83)
        self.fields = np.stack(fields, axis=0)
        self.params_raw = np.asarray(params, np.float32) if self.conditional else None

        self.stats = self._load_or_compute_stats(cfg.dataset_stat)

    def _compute_stats(self) -> Dict[str, np.ndarray]:
        vel = self.fields[..., :2]
        prs = self.fields[..., 2]
        stats = {
            "vel_mean": np.mean(vel),
            "vel_std": np.std(vel),
            "prs_mean": np.mean(prs),
            "prs_std": np.std(prs),
            "height": self.fields.shape[2],
            "width": self.fields.shape[3],
        }
        if self.conditional:
            # +/- 2 offset on the param range (twophase_flow_stage2.py:296-297)
            stats["param_min"] = np.min(self.params_raw) - 2.0
            stats["param_max"] = np.max(self.params_raw) + 2.0
        return stats

    def _load_or_compute_stats(self, stat_path):
        if stat_path and os.path.exists(stat_path):
            stats = np.load(stat_path, allow_pickle=True)
            out = {k: stats[k] for k in stats.files if k != "allow_pickle"}
            if self.conditional and "param_min" not in out:
                # stat file predates the conditional variant (e.g. written by
                # a stage-1 run): augment with the param range
                out["param_min"] = np.min(self.params_raw) - 2.0
                out["param_max"] = np.max(self.params_raw) + 2.0
            return out
        stats = self._compute_stats()
        if stat_path:
            np.savez(stat_path, **stats, allow_pickle=True)
        return stats

    @property
    def n_cases(self):
        return self.fields.shape[0]

    def normalize(self, x):
        """[..., H, W, 4] raw -> normalized (vof untouched)."""
        out = np.empty_like(x)
        out[..., :2] = (x[..., :2] - float(self.stats["vel_mean"])) / float(self.stats["vel_std"])
        out[..., 2] = (x[..., 2] - float(self.stats["prs_mean"])) / float(self.stats["prs_std"])
        out[..., 3] = x[..., 3]
        return out

    def normalize_param(self, p):
        lo, hi = float(self.stats["param_min"]), float(self.stats["param_max"])
        return (p - lo) / (hi - lo)

    def denormalize(self, x):
        """jnp/np [..., H, W, 4]: un-normalize + Dirichlet walls + vof clamp
        (twophase_flow_stage1.py:148-169). Works on jax arrays."""
        import jax.numpy as jnp

        is_np = isinstance(x, np.ndarray)
        xp = np if is_np else jnp
        vel = x[..., :2] * float(self.stats["vel_std"]) + float(self.stats["vel_mean"])
        # zero velocity on all four boundaries
        h, w = x.shape[-3], x.shape[-2]
        mask = np.ones((h, w, 1), np.float32)
        mask[0, :] = 0.0
        mask[-1, :] = 0.0
        mask[:, 0] = 0.0
        mask[:, -1] = 0.0
        vel = vel * xp.asarray(mask)
        prs = x[..., 2:3] * float(self.stats["prs_std"]) + float(self.stats["prs_mean"])
        vof = xp.clip(x[..., 3:4], 0.0, 1.0 + 1e-8)
        return xp.concatenate([vel, prs, vof], axis=-1)


class TankSloshingStage1(_TankBase):
    def __len__(self):
        if self.train_mode:
            return self.n_cases * self.case_len
        return self.n_cases

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        case = indices // self.case_len
        t = indices % self.case_len
        return self.normalize(self.fields[case, t])

    def eval_trajectories(self) -> np.ndarray:
        return self.normalize(self.fields)


class TankSloshingStage2(_TankBase):
    def __init__(self, cfg, train_mode: bool = True):
        super().__init__(cfg, train_mode)
        self.in_tw = cfg.in_tw
        self.out_tw = cfg.out_tw
        self.encoded: Optional[np.ndarray] = None

    def __len__(self):
        if self.train_mode:
            return self.n_cases * (self.case_len - self.in_tw - self.out_tw)
        return self.n_cases

    def encode_dataset(self, encode_fn: Callable, batch: int = 32):
        frames = self.normalize(self.fields)
        flat = frames.reshape(-1, *frames.shape[2:])
        outs = []
        for i in range(0, flat.shape[0], batch):
            chunk = flat[i : i + batch]
            pad = batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            z = np.asarray(encode_fn(chunk))
            outs.append(z[: batch - pad] if pad else z)
        z = np.concatenate(outs, axis=0)
        self.encoded = z.reshape(self.n_cases, self.case_len, *z.shape[1:])

    def _window(self, indices):
        # NOTE: the reference divides by case_len while __len__ uses
        # case_len - in_tw - out_tw (twophase_flow_stage2.py:150 vs :55),
        # skewing case/time pairing. We use the consistent denominator;
        # set window_quirk=True in the config to replicate the skew.
        denom = (
            self.case_len
            if self.cfg.window_quirk
            else self.case_len - self.in_tw - self.out_tw
        )
        case = indices // denom
        t = indices % (self.case_len - self.in_tw - self.out_tw)
        return case, t

    def get_batch(self, indices: np.ndarray):
        assert self.encoded is not None, "call encode_dataset() first"
        case, start = self._window(indices)
        tw = self.in_tw + self.out_tw
        t_idx = start[:, None] + np.arange(tw)[None, :]
        z = self.encoded[case[:, None], t_idx]
        return z[:, : self.in_tw], z[:, self.in_tw :]

    def eval_trajectories(self):
        traj = self.normalize(self.fields)
        return traj[:, : self.in_tw], traj[:, self.in_tw :]


class SimpleTankSloshingData(TankSloshingStage2):
    """Pixel-space stage-2 twin (reference:
    twophase_flow_stage2.py:393-761): same windowing, raw fields instead of
    latents — no encode pre-pass needed."""

    def get_batch(self, indices: np.ndarray):
        case, start = self._window(indices)
        tw = self.in_tw + self.out_tw
        t_idx = start[:, None] + np.arange(tw)[None, :]
        x = self.normalize(self.fields)[case[:, None], t_idx]
        return x[:, : self.in_tw], x[:, self.in_tw :]


class ConditionalTankSloshingStage2(TankSloshingStage2):
    conditional = True

    def get_batch(self, indices: np.ndarray):
        z_in, z_out = super().get_batch(indices)
        case, _ = self._window(indices)
        return z_in, z_out, self.normalize_param(self.params_raw[case])

    def eval_trajectories(self):
        x, y = super().eval_trajectories()
        return x, y, self.normalize_param(self.params_raw)


class ConditionalSimpleTankSloshingData(ConditionalTankSloshingStage2):
    """Conditional pixel-space twin (twophase_flow_stage2.py:547-761)."""

    def get_batch(self, indices: np.ndarray):
        case, start = self._window(indices)
        tw = self.in_tw + self.out_tw
        t_idx = start[:, None] + np.arange(tw)[None, :]
        x = self.normalize(self.fields)[case[:, None], t_idx]
        return (
            x[:, : self.in_tw],
            x[:, self.in_tw :],
            self.normalize_param(self.params_raw[case]),
        )
