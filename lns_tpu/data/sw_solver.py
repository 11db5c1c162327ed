"""Finite-difference rotating shallow-water solver (beta-plane channel).

Generates shallow-water corpora with genuine PDE dynamics for convergence
runs on the SW workload. The reference's SW dataset is PDEArena's
ShallowWater-2D zarr store (u, v, pres on a 96x192 grid, periodic in x —
exactly the topology the half-periodic autoencoder encodes:
modules/autoencoder2d_half_periodic.py pads circular along
``periodic_direction='x'`` and zeros along y). This solver reproduces that
topology: a zonally periodic channel with free-slip walls at the two y
boundaries, rotating at a beta-plane Coriolis parameter, so the corpus
carries Rossby/gravity-wave dynamics with the same boundary structure as
the real data.

Numerics: collocated centered finite differences (periodic wrap in x;
ghost rows in y with even parity for u/eta and odd parity for v, i.e.
free-slip walls with v = 0), classic RK4 in time, Laplacian viscosity.
The whole trajectory integrates as one ``lax.scan`` under jit, vectorized
over cases.

Equations (g = 1, mean depth H0 = 1):

    u_t = -(u u_x + v u_y) + f v - g eta_x + nu lap u
    v_t = -(u v_x + v v_y) - f u - g eta_y + nu lap v
    eta_t = -d/dx((H0+eta) u) - d/dy((H0+eta) v) + nu lap eta

with f(y) = f0 + beta (y - 1/2). Initial conditions are smooth random
height fields (cos(pi k y) wall-compatible modes x periodic x modes) in
geostrophic balance.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _initial_eta(rng: np.random.Generator, ncase: int, h: int, w: int,
                 amp: float = 0.12, kmax: int = 4) -> np.ndarray:
    """Random smooth height anomaly: zonal Fourier modes x cos(pi k y)
    wall modes (zero y-derivative at both walls)."""
    y = np.linspace(0.0, 1.0, h)[:, None]
    x = np.linspace(0.0, 2.0, w, endpoint=False)[None, :]
    eta = np.zeros((ncase, h, w), np.float64)
    for c in range(ncase):
        for _ in range(6):
            kx = rng.integers(1, kmax + 1)
            ky = rng.integers(0, kmax + 1)
            ph = rng.uniform(0, 2 * np.pi)
            a = rng.normal(0, 1.0) / (1.0 + kx * kx + ky * ky)
            eta[c] += a * np.cos(np.pi * ky * y) * np.cos(np.pi * kx * x + ph)
    eta *= amp / (np.abs(eta).max(axis=(1, 2), keepdims=True) + 1e-12)
    return eta


def simulate_sw(eta0: np.ndarray, f0: float = 6.0, beta: float = 8.0,
                nu: float = 5e-4, dt: float = 2e-3, t_record: float = 0.05,
                n_records: int = 88, spinup_records: int = 12) -> np.ndarray:
    """Integrate from height anomaly eta0 [ncase, h, w]; returns
    (u, v, pres) as [ncase, n_records, h, w] each. Velocities start in
    geostrophic balance; `spinup_records` extra records are integrated and
    discarded so the recorded window starts past the initial adjustment.
    """
    import jax
    import jax.numpy as jnp

    ncase, h, w = eta0.shape
    dy = 1.0 / (h - 1)
    dx = 2.0 / w
    g = 1.0
    h0 = 1.0
    steps_per_rec = int(round(t_record / dt))

    yy = np.linspace(0.0, 1.0, h)[:, None]
    f_cor = (f0 + beta * (yy - 0.5)).astype(np.float32)  # [h, 1]

    def ddx(a):
        return (jnp.roll(a, -1, axis=-1) - jnp.roll(a, 1, axis=-1)) / (2 * dx)

    def _ghost(a, parity):
        # free-slip wall ghosts: even fields reflect (zero normal gradient),
        # odd fields negate (zero value at the wall rows themselves is
        # enforced separately for v)
        top = parity * a[:, 1:2]
        bot = parity * a[:, -2:-1]
        return jnp.concatenate([top, a, bot], axis=1)

    def ddy(a, parity):
        ag = _ghost(a, parity)
        return (ag[:, 2:] - ag[:, :-2]) / (2 * dy)

    def lap(a, parity):
        ax = (jnp.roll(a, -1, axis=-1) - 2 * a + jnp.roll(a, 1, axis=-1)) / dx**2
        ag = _ghost(a, parity)
        ay = (ag[:, 2:] - 2 * a + ag[:, :-2]) / dy**2
        return ax + ay

    def _zero_wall_v(v):
        v = v.at[:, 0].set(0.0)
        return v.at[:, -1].set(0.0)

    def rhs(state):
        u, v, eta = state
        du = (-u * ddx(u) - v * ddy(u, 1.0) + f_cor * v - g * ddx(eta)
              + nu * lap(u, 1.0))
        dv = (-u * ddx(v) - v * ddy(v, -1.0) - f_cor * u - g * ddy(eta, 1.0)
              + nu * lap(v, -1.0))
        depth = h0 + eta
        deta = -ddx(depth * u) - ddy(depth * v, -1.0) + nu * lap(eta, 1.0)
        return du, dv, deta

    def rk4(state, _):
        def axpy(s, k, a):
            u = s[0] + a * k[0]
            v = _zero_wall_v(s[1] + a * k[1])
            return (u, v, s[2] + a * k[2])

        k1 = rhs(state)
        k2 = rhs(axpy(state, k1, dt / 2))
        k3 = rhs(axpy(state, k2, dt / 2))
        k4 = rhs(axpy(state, k3, dt))
        u = state[0] + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        v = _zero_wall_v(
            state[1] + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))
        eta = state[2] + dt / 6 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        return (u, v, eta), None

    def record_chain(state, n):
        def rec(state, _):
            state, _ = jax.lax.scan(rk4, state, None, length=steps_per_rec)
            return state, jnp.stack(state, axis=1)  # [ncase, 3, h, w]

        return jax.lax.scan(rec, state, None, length=n)

    # geostrophically balanced initial velocities
    eta_j = jnp.asarray(eta0, jnp.float32)
    u0 = -(g / f_cor) * ddy(eta_j, 1.0)
    v0 = _zero_wall_v((g / f_cor) * ddx(eta_j))
    state = (u0, v0, eta_j)

    run = jax.jit(lambda s: record_chain(record_chain(s, spinup_records)[0],
                                         n_records)[1])
    recs = np.asarray(run(state))  # [n_records, ncase, 3, h, w]
    recs = np.moveaxis(recs, 0, 1)  # [ncase, n_records, 3, h, w]
    if not np.isfinite(recs).all():
        raise FloatingPointError("shallow-water integration blew up")
    u, v, eta = recs[:, :, 0], recs[:, :, 1], recs[:, :, 2]
    pres = g * eta
    return u, v, pres


def make_sw_solver_store(dirpath: str, ncase: int = 64, case_len: int = 88,
                         h: int = 96, w: int = 192, seed: int = 7,
                         test_frac: float = 0.2,
                         fmt: str = "zarr") -> Tuple[str, str, str]:
    """Generate train/test SW stores + normstats in the exact on-disk
    layout the SW loaders consume (zarr dirs with u/v/pres [N,T,H,W] +
    normstats.npz). Returns (train_path, test_path, stat_path)."""
    from lns_tpu.data.zarr_reader import write_zarr_array

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_test = max(2, int(round(ncase * test_frac)))
    eta0 = _initial_eta(rng, ncase + n_test, h, w)
    u, v, p = simulate_sw(eta0, n_records=case_len)

    paths = []
    splits = (("train", slice(0, ncase)), ("test", slice(ncase, None)))
    stat_path = os.path.join(dirpath, "normstats.npz")
    for split, sl in splits:
        us, vs, ps = u[sl], v[sl], p[sl]
        if fmt == "zarr":
            store = os.path.join(dirpath, f"{split}.zarr")
            os.makedirs(store, exist_ok=True)
            ck = (1, case_len, h, w)
            write_zarr_array(os.path.join(store, "u"), us, chunks=ck)
            write_zarr_array(os.path.join(store, "v"), vs, chunks=ck)
            write_zarr_array(os.path.join(store, "pres"), ps, chunks=ck)
        else:
            store = os.path.join(dirpath, f"{split}.npz")
            np.savez(store, u=us, v=vs, pres=ps)
        paths.append(store)
        if split == "train":
            np.savez(stat_path,
                     u_mean=np.float32(us.mean()), u_std=np.float32(us.std()),
                     v_mean=np.float32(vs.mean()), v_std=np.float32(vs.std()),
                     pres_mean=np.float32(ps.mean()),
                     pres_std=np.float32(ps.std()))
    return paths[0], paths[1], stat_path
