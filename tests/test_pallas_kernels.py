"""Pallas kernel golden tests (interpret mode on CPU; the same kernels run
compiled on TPU). Each kernel must match its XLA fallback exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lns_tpu.pallas_kernels.axial_attention import axial_kernel_apply
from lns_tpu.pallas_kernels.group_norm import fused_group_norm_swish


def test_fused_group_norm_swish_matches_xla():
    import lns_tpu.ops as ops

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 16, 64))
    scale = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.1 + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
    y = fused_group_norm_swish(x, scale, bias, 32, eps=1e-6, apply_swish=True, interpret=True)

    gn = ops.GroupNorm(32, 64, eps=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.array(y), np.array(ref), atol=2e-6)


@pytest.mark.parametrize("shape", [(3, 8, 12, 4, 64), (2, 16, 16, 8, 64), (2, 7, 15, 2, 128)])
def test_axial_kernel_matches_einsum(shape):
    B, H, W, heads, d = shape
    k = jax.random.PRNGKey(0)
    phi = jax.random.normal(k, (B, H, W, heads * d))
    kx = jax.random.normal(jax.random.PRNGKey(1), (B, heads, H, H))
    ky = jax.random.normal(jax.random.PRNGKey(2), (B, heads, W, W))
    out = axial_kernel_apply(kx, ky, phi, heads, interpret=True)
    p5 = phi.reshape(B, H, W, heads, d)
    ref = jnp.einsum("bnij,bjwnd->biwnd", kx, p5)
    ref = jnp.einsum("bnlm,bimnd->bilnd", ky, ref).reshape(B, H, W, heads * d)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=5e-5)


def test_headmajor_pallas_kernel_matches_xla():
    """The library Pallas kernel (head-major fused axial apply) must match
    the XLA reference formulation. FABlock2D itself uses the measured-
    fastest per-head XLA formulation (DESIGN.md) — the Pallas kernels are
    kept as a library of validated (and honestly benchmarked) ops."""
    from lns_tpu.ops.factorized_attention import axial_apply_headmajor
    from lns_tpu.pallas_kernels.axial_attention import (
        axial_kernel_apply_headmajor,
    )

    B, heads, H, W, d = 2, 4, 8, 16, 64
    kx = jax.random.normal(jax.random.PRNGKey(1), (B, heads, H, H))
    ky = jax.random.normal(jax.random.PRNGKey(2), (B, heads, W, W))
    phi = jax.random.normal(jax.random.PRNGKey(0), (B, heads, H, W, d))
    out = axial_kernel_apply_headmajor(
        kx.reshape(B * heads, H, H), ky.reshape(B * heads, W, W),
        phi.reshape(B * heads, H, W, d), interpret=True,
    ).reshape(B, heads, H, W, d)
    ref = axial_apply_headmajor(kx, ky, phi)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=5e-5)


@pytest.mark.slow  # looped per-head core: 8x compile, ~40 s on the quick tier
def test_fablock_perhead_path_matches_headmajor_math():
    """FABlock2D dispatches to per-head chains for h*w > 1024; its output
    must equal the head-major formulation run with the same params."""
    import flax.core
    import lns_tpu.ops as ops
    from lns_tpu.ops.factorized_attention import (
        axial_apply_headmajor,
        instance_norm_headmajor,
    )

    h, w, c, heads, d = 40, 28, 16, 2, 8
    assert h * w > 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
    fab = ops.FABlock2D(c, d, d, heads, c)
    p = fab.init(jax.random.PRNGKey(1), x)
    out = fab.apply(p, x)

    # head-major reference with the same params, built from the module's
    # own submodule outputs (capture intermediates via a manual re-run)
    params = flax.core.unfreeze(p)["params"]
    u = ops.GroupNorm(1, c, eps=1e-5).apply(
        {"params": params["in_norm"]}, x)
    w_in = params["in_proj"]["kernel"].reshape(c, heads, d)
    w_o1 = params["out_fc1"]["kernel"].reshape(heads, d, c)
    u_in = ops.Conv1x1(c, use_bias=False).apply(
        {"params": params["to_in"]}, u)
    from lns_tpu.ops.factorized_attention import LowRankKernel, PoolingReducer

    u_x = PoolingReducer(c, c, d).apply({"params": params["to_x"]}, u_in)
    u_y = PoolingReducer(c, c, d).apply(
        {"params": params["to_y"]}, u_in.transpose(0, 2, 1, 3))
    kx = LowRankKernel(d, d * 2, heads, use_rotary_emb=True).apply(
        {"params": params["low_rank_kernel_x"]}, u_x)
    ky = LowRankKernel(d, d * 2, heads, use_rotary_emb=True).apply(
        {"params": params["low_rank_kernel_y"]}, u_y)
    u_phi = jnp.einsum("bhwc,cnd->bnhwd", u, w_in)
    phi = axial_apply_headmajor(kx, ky, u_phi)
    ref = instance_norm_headmajor(phi)
    ref = jnp.einsum("bnhwd,ndo->bhwo", ref, w_o1)
    ref = jax.nn.gelu(ref, approximate=False)
    ref = ops.Conv1x1(c, use_bias=False).apply(
        {"params": params["out_fc2"]}, ref)
    ref = ref + x
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=2e-4)


@pytest.mark.parametrize("impl", [
    pytest.param("perhead", marks=pytest.mark.slow),  # 8x compile (python head loop)
    pytest.param("gram", marks=pytest.mark.slow),  # 8x compile (python head loop)
    "batched", "batchedgram"])
@pytest.mark.parametrize("hw", [(16, 16), (40, 28), (28, 40)])
def test_fablock_impl_equivalence(impl, hw, monkeypatch):
    """Every FABlock2D formulation (round-3 shape dispatch: perhead at
    16x16-class sizes, head-major at 32x32-class, gram above) must produce
    the same output for the same params as the head-major reference."""
    import lns_tpu.ops as ops

    h, w = hw
    c, heads, d = 16, 4, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
    fab = ops.FABlock2D(c, d, d, heads, c)
    p = fab.init(jax.random.PRNGKey(1), x)

    monkeypatch.setenv("LNS_TPU_FAB_IMPL", "headmajor")
    ref = fab.apply(p, x)
    monkeypatch.setenv("LNS_TPU_FAB_IMPL", impl)
    out = fab.apply(p, x)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=3e-4)


@pytest.mark.parametrize("impl", [
    pytest.param("perhead", marks=pytest.mark.slow),  # 8x compile (python head loop)
    pytest.param("gram", marks=pytest.mark.slow),  # 8x compile (python head loop)
    "batched", "batchedgram"])
def test_fablock_impl_gradient_parity(impl, monkeypatch):
    """The formulation dispatch also runs under jax.grad (stage-1 AE
    training backprops through decoder FABlock2Ds), so every core's VJP
    must match the head-major reference — catches e.g. a wrong stop-grad
    or dtype cut in the folded-statistics formulations."""
    import lns_tpu.ops as ops

    c, heads, d = 16, 4, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20, c))
    fab = ops.FABlock2D(c, d, d, heads, c)
    p = fab.init(jax.random.PRNGKey(1), x)

    def loss(params, x):
        y = fab.apply(params, x)
        return jnp.sum(jnp.sin(y))  # non-trivial cotangent

    monkeypatch.setenv("LNS_TPU_FAB_IMPL", "headmajor")
    ref_gp, ref_gx = jax.grad(loss, argnums=(0, 1))(p, x)
    monkeypatch.setenv("LNS_TPU_FAB_IMPL", impl)
    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.array(gx), np.array(ref_gx), atol=5e-4)
    for ref_leaf, leaf in zip(
        jax.tree.leaves(ref_gp), jax.tree.leaves(gp), strict=True
    ):
        np.testing.assert_allclose(
            np.array(leaf), np.array(ref_leaf), atol=5e-4
        )


# -- fused latent rollout (prop_rollout.py) ---------------------------------

@pytest.mark.parametrize(
    "pm,h,w,c_lat",
    [("circular", 8, 8, 16), ("zeros", 7, 15, 64), ("half_periodic_x", 12, 24, 64)],
)
def test_fused_rollout_matches_scan(pm, h, w, c_lat):
    from lns_tpu.models.propagator import SimpleCNN
    from lns_tpu.pallas_kernels import prop_rollout as pr

    nb, c, dil, steps, b = 2, 64, 2, 5, 2
    model = SimpleCNN(latent_dim=c_lat, prop_n_block=nb, prop_n_embd=c,
                      dilation=dil, padding_mode=pm, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(key, (b, h, w, c_lat), jnp.float32)
    vars_ = model.init(key, z0)

    def step(carry, _):
        zn = model.apply(vars_, carry)
        return zn, zn

    _, zs_ref = jax.lax.scan(step, z0, None, length=steps)
    packed = pr.pack_simple_cnn_params(vars_["params"], nb, dtype=jnp.float32)
    zs = pr.fused_rollout(z0, packed, steps=steps, n_block=nb, dilation=dil,
                          padding_mode=pm, interpret=True)
    scale = float(jnp.max(jnp.abs(zs_ref)))
    np.testing.assert_allclose(np.array(zs), np.array(zs_ref),
                               atol=2e-5 * scale)


def test_fused_rollout_lane_padding_exact():
    """The 128-lane zero-padding of the latent carry must be exact: padded
    lanes of the packed projections are zero, so padded carry lanes stay 0."""
    from lns_tpu.models.propagator import SimpleCNN
    from lns_tpu.pallas_kernels import prop_rollout as pr

    model = SimpleCNN(latent_dim=16, prop_n_block=1, prop_n_embd=32,
                      dilation=1, padding_mode="circular", dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    z0 = jax.random.normal(key, (1, 8, 8, 16), jnp.float32)
    vars_ = model.init(key, z0)
    packed = pr.pack_simple_cnn_params(vars_["params"], 1, dtype=jnp.float32)
    in_w, out_w, out_b = packed[0], packed[-2], packed[-1]
    assert in_w.shape[0] == 128 and out_w.shape[1] == 128
    assert float(jnp.abs(in_w[16:]).max()) == 0.0
    assert float(jnp.abs(out_w[:, 16:]).max()) == 0.0
    assert float(jnp.abs(out_b[:, 16:]).max()) == 0.0


def test_predict_latents_pallas_gate():
    """Gating: SimpleCNN+wrap padding is eligible; zeros / conditional are
    not; the env/default policy is OFF on the CPU test backend."""
    from lns_tpu.config import load_config
    from lns_tpu.models.latent_dynamics import LatentDynamics
    from lns_tpu.pallas_kernels import backend as plb

    cfg = load_config("/root/reference/configs/ns2d_stage2_prop.yml")
    ld = LatentDynamics(cfg)
    assert ld._pallas_rollout_ok(use_pallas=True)
    assert not ld._pallas_rollout_ok(use_pallas=False)
    # default policy resolves False on the CPU backend
    assert not ld._pallas_rollout_ok(use_pallas=None)
    plb.set_rollout_enabled(True)
    try:
        assert ld._pallas_rollout_ok(use_pallas=None)
    finally:
        plb.set_rollout_enabled(None)


def test_fab_fused_core_matches_xla_core():
    """Single-pass fused FAB core (fab_core.py) vs the XLA
    _batched_gram_core: same apply pair, InstanceNorm statistics, and
    folded out-projection — exact to f32 rounding, blocked and unblocked
    grids. (Interpret mode: the kernel does not compile on this stack's
    Mosaic — DESIGN.md op-class map — but stays golden-tested.)"""
    import jax
    import jax.numpy as jnp

    from lns_tpu.ops.factorized_attention import FABlock2D
    from lns_tpu.pallas_kernels.fab_core import fab_fused_core

    for (b, n, h, w, c) in [(4, 8, 16, 16, 32), (3, 4, 12, 24, 16)]:
        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        u = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
        kx = jax.random.normal(ks[1], (b, n, h, h), jnp.float32) / h
        ky = jax.random.normal(ks[2], (b, n, w, w), jnp.float32) / w
        w_in = jax.random.normal(ks[3], (c, n, c), jnp.float32) / np.sqrt(c)
        w_o1 = jax.random.normal(ks[4], (n, c, c), jnp.float32) / np.sqrt(c)
        ref = np.asarray(FABlock2D._batched_gram_core(u, kx, ky, w_in, w_o1))
        for bs in (0, 1):
            out = np.asarray(fab_fused_core(
                u, kx, ky, w_in, w_o1, block_b=bs, interpret=True))
            np.testing.assert_allclose(
                out, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max(),
                err_msg=f"bs={bs} {b}x{n}x{h}x{w}x{c}")


def test_fablock_pallas2p_gate_and_forward(monkeypatch):
    """FABlock2D routes its c-space shapes through the two-pass Pallas core
    when the gate is on (interpret mode here), with identical outputs; a
    forced LNS_TPU_FAB_IMPL=batchedgram keeps the XLA core."""
    import jax
    import jax.numpy as jnp

    from lns_tpu.ops.factorized_attention import FABlock2D
    from lns_tpu.pallas_kernels import backend

    b, h, w, c = 2, 16, 16, 32
    blk = FABlock2D(dim=c, dim_head=c, latent_dim=c, heads=4, dim_out=c)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.float32)
    params = blk.init(jax.random.PRNGKey(1), x)

    monkeypatch.setenv("LNS_TPU_FAB_IMPL", "batchedgram")
    ref = np.asarray(blk.apply(params, x))

    monkeypatch.delenv("LNS_TPU_FAB_IMPL")
    monkeypatch.setenv("LNS_TPU_FAB2P_INTERPRET", "1")
    backend.set_fab2p_enabled(True)
    try:
        out = np.asarray(blk.apply(params, x))
    finally:
        backend.set_fab2p_enabled(None)
    np.testing.assert_allclose(out, ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())
