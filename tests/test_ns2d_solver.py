"""Unit tests for the pseudo-spectral NS solver corpus generator."""

import numpy as np

from lns_tpu.data.ns2d_solver import (
    gaussian_random_field,
    make_ns2d_solver_npz,
    simulate_ns2d,
)


def test_grf_statistics():
    rng = np.random.default_rng(0)
    w = gaussian_random_field(rng, 64, 4)
    assert w.shape == (4, 64, 64)
    # zero-mean by construction (k=0 amplitude zeroed)
    assert abs(w.mean()) < 1e-5
    # red spectrum: low-k energy dominates high-k
    wh = np.abs(np.fft.fft2(w[0]))
    assert wh[1, 1] > 10 * wh[20, 20]


def test_simulate_stable_and_incompressible():
    rng = np.random.default_rng(1)
    w0 = gaussian_random_field(rng, 32, 2)
    traj = simulate_ns2d(w0, visc=1e-3, t_record=0.2, n_records=4, dt=1e-3)
    assert traj.shape == (2, 4, 32, 32)
    assert np.isfinite(traj).all()
    # vorticity stays zero-mean (periodic incompressible flow conserves it)
    assert np.abs(traj.mean(axis=(2, 3))).max() < 1e-3
    # dynamics actually evolve the field
    assert np.abs(traj[:, 0] - traj[:, -1]).max() > 1e-3


def test_npz_layout(tmp_path):
    path = make_ns2d_solver_npz(str(tmp_path / "ns.npz"), ncase=2, case_len=4,
                                n=32, visc=1e-3, t_record=0.2, dt=1e-3,
                                spinup_records=1)
    with np.load(path) as d:
        c = d["all_sol_center"]
        f = d["all_sol_forward"]
        b = d["all_sol_backward"]
    # reference layout [T, H, W, Ncase] (dataset/ns2d_fno_stage1.py)
    assert c.shape == f.shape == b.shape == (4, 32, 32, 2)
    # forward/backward are the +/-1-frame shifts of the same trajectory
    np.testing.assert_allclose(c[1:], f[:-1])
    np.testing.assert_allclose(c[:-1], b[1:])
