"""Pseudo-spectral 2D incompressible Navier-Stokes solver (vorticity form).

Generates NS2d training corpora with genuine PDE dynamics for convergence
runs — the reference's NS2d dataset (dataset/ns2d_fno_stage1.py expects
`all_sol_center/forward/backward [T, H, W, Ncase]` npz) comes from exactly
this class of solver (FNO-style forced turbulence: Gaussian-random-field
initial vorticity, fixed sinusoidal forcing, periodic unit square), so a
corpus produced here exercises the two-stage pipeline on data with the same
statistical character as the real thing.

Numerics: vorticity-streamfunction formulation on a periodic grid; Fourier
pseudo-spectral spatial discretization with 2/3-rule dealiasing;
Crank-Nicolson for the viscous term and explicit treatment of the advective
term per step (the standard FNO data-generator scheme). Whole trajectory is
one `lax.scan` inside jit — batch of cases integrates vectorized on the
TPU; 64x64 x 72 cases x 10^4 steps runs in seconds.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def gaussian_random_field(rng: np.random.Generator, n: int, ncase: int,
                          alpha: float = 2.5, tau: float = 7.0) -> np.ndarray:
    """Periodic GRF samples with spectral density ~ tau^(2(alpha-1)) *
    (4 pi^2 |k|^2 + tau^2)^(-alpha) (the FNO initial-condition measure
    N(0, 7^(3/2) (-Delta + 49 I)^(-2.5)))."""
    kfreq = np.fft.fftfreq(n, d=1.0 / n)
    kx, ky = np.meshgrid(kfreq, kfreq, indexing="ij")
    k2 = 4 * np.pi**2 * (kx**2 + ky**2)
    amp = tau ** (alpha - 1.0) * (k2 + tau**2) ** (-alpha / 2.0)
    amp[0, 0] = 0.0  # zero-mean field
    noise = rng.normal(size=(ncase, n, n))
    w_hat = np.fft.fft2(noise) * amp[None] * n  # n: unit-variance white noise
    w = np.real(np.fft.ifft2(w_hat)).astype(np.float32)
    return w


def simulate_ns2d(w0: np.ndarray, visc: float = 1e-3, t_record: float = 0.5,
                  n_records: int = 30, dt: float = 2.5e-4) -> np.ndarray:
    """Integrate forced NS vorticity from w0 [ncase, n, n]; returns
    [ncase, n_records, n, n] (first record = t_record, like the FNO data).

    Forcing f = 0.1 (sin(2 pi (x+y)) + cos(2 pi (x+y))).

    Stability note: the advective term is explicit Euler (only the viscous
    term is Crank-Nicolson), so dt must keep |u|_max k_max dt well below 1
    — the published generator uses dt = 1e-4 at 256^2; dt = 2.5e-4 at 64^2
    is the same lambda*dt (k_max 4x smaller). dt = 2e-3 measurably blows up
    near t ~ 25 at visc 1e-4.
    """
    import jax
    import jax.numpy as jnp

    ncase, n, _ = w0.shape
    steps_per_rec = int(round(t_record / dt))

    kfreq = np.fft.fftfreq(n, d=1.0 / n)
    kx = kfreq[:, None] * np.ones((1, n // 2 + 1))
    ky = np.ones((n, 1)) * kfreq[None, : n // 2 + 1]
    lap = 4 * np.pi**2 * (kx**2 + ky**2)
    inv_lap = np.where(lap == 0.0, 1.0, lap)
    # 2/3-rule dealias mask on the rfft grid
    cutoff = n // 3
    dealias = ((np.abs(kx) <= cutoff) & (np.abs(ky) <= cutoff)).astype(np.float64)

    xs = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    f = 0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y)))
    f_hat = np.fft.rfft2(f)

    # NOTE: closures must stay numpy (host) arrays — jit embeds them as
    # program constants; device-array constants would need a host fetch at
    # lowering time, which the axon tunnel can't do for complex dtypes.
    kx_j = (2j * np.pi * kx).astype(np.complex64)
    ky_j = (2j * np.pi * ky).astype(np.complex64)
    lap_j = lap.astype(np.float32)
    inv_lap_j = inv_lap.astype(np.float32)
    dealias_j = dealias.astype(np.float32)
    f_hat_j = f_hat.astype(np.complex64)

    def nonlinear(w_hat):
        psi_hat = w_hat / inv_lap_j
        u = jnp.fft.irfft2(ky_j * psi_hat, s=(n, n))
        v = jnp.fft.irfft2(-kx_j * psi_hat, s=(n, n))
        wx = jnp.fft.irfft2(kx_j * w_hat, s=(n, n))
        wy = jnp.fft.irfft2(ky_j * w_hat, s=(n, n))
        adv = u * wx + v * wy
        return jnp.fft.rfft2(adv) * dealias_j

    def step(w_hat, _):
        # Crank-Nicolson viscous / explicit advective (FNO generator scheme)
        rhs = w_hat - dt * nonlinear(w_hat) + dt * f_hat_j \
            - 0.5 * dt * visc * lap_j * w_hat
        w_hat = rhs / (1.0 + 0.5 * dt * visc * lap_j)
        return w_hat, None

    # ONE jitted program advancing one record interval (a single scan —
    # nesting the record loop inside jit as a second scan compiles far
    # slower on the remote-compile stack than 30 ms/call of host RTT costs)
    @jax.jit
    def advance(w_hat):
        w_hat, _ = jax.lax.scan(step, w_hat, None, length=steps_per_rec)
        return w_hat, jnp.fft.irfft2(w_hat, s=(n, n)).astype(jnp.float32)

    w_hat = jnp.fft.rfft2(jnp.asarray(w0, jnp.float32))
    recs = []
    for _ in range(n_records):
        w_hat, rec = advance(w_hat)
        recs.append(np.asarray(rec))
    return np.stack(recs, axis=1)  # [ncase, n_records, n, n]


def make_ns2d_solver_npz(path: str, ncase: int = 72, case_len: int = 30,
                         n: int = 64, visc: float = 1e-3, t_record: float = 0.5,
                         seed: int = 0, dt: float = 2.5e-4,
                         spinup_records: int = 4) -> str:
    """Generate an NS2d corpus with the solver and write the reference npz
    layout (keys/axes per dataset/ns2d_fno_stage1.py: [T, H, W, Ncase];
    forward/backward are the +/-1-frame shifted trajectories the reference
    loads, sampled here with the same t_record spacing)."""
    rng = np.random.default_rng(seed)
    w0 = gaussian_random_field(rng, n, ncase)
    # integrate past the GRF transient, keep case_len + 2 records for the
    # (backward, center, forward) triple structure
    traj = simulate_ns2d(w0, visc=visc, t_record=t_record,
                         n_records=spinup_records + case_len + 2, dt=dt)
    traj = traj[:, spinup_records:]  # [ncase, case_len+2, n, n]
    center = traj[:, 1:-1]
    backward = traj[:, :-2]
    forward = traj[:, 2:]
    to_ref = lambda a: np.transpose(a, (1, 2, 3, 0)).astype(np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, all_sol_center=to_ref(center), all_sol_forward=to_ref(forward),
             all_sol_backward=to_ref(backward))
    return path
