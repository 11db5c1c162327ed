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


def test_fablock_pallas_path_matches_xla_path():
    import lns_tpu.ops as ops
    from lns_tpu.pallas_kernels import backend

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 64))
    fab = ops.FABlock2D(64, 16, 16, 4, 64)
    p = fab.init(jax.random.PRNGKey(1), x)
    backend.set_enabled(False)
    ref = fab.apply(p, x)
    import lns_tpu.pallas_kernels.axial_attention as ax

    orig = ax.axial_kernel_apply_headmajor
    try:
        # pallas path in interpret mode (CPU)
        ax.axial_kernel_apply_headmajor = lambda kx, ky, phi, interpret=False: orig(
            kx, ky, phi, interpret=True
        )
        backend.set_enabled(True)
        out = fab.apply(p, x)
    finally:
        backend.set_enabled(None)
        ax.axial_kernel_apply_headmajor = orig
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=5e-5)
