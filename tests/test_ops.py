"""Unit tests for the ops library against torch primitive semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from jax import random

import lns_tpu.ops as ops
from lns_tpu.ops.sampling import resize_nearest_torch, upsample_nearest_2x

KEY = random.PRNGKey(0)


def to_nchw(x):
    return torch.tensor(np.array(x)).permute(0, 3, 1, 2)


def from_nchw(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


class TestNorms:
    def test_groupnorm_matches_torch(self):
        x = random.normal(KEY, (2, 8, 12, 64))
        gn = ops.GroupNorm(32, 64)
        p = gn.init(KEY, x)
        y = gn.apply(p, x)
        yt = torch.nn.GroupNorm(32, 64, eps=1e-6)(to_nchw(x))
        np.testing.assert_allclose(np.array(y), from_nchw(yt), atol=2e-6)

    def test_groupnorm_single_group(self):
        x = random.normal(KEY, (2, 4, 4, 16))
        gn = ops.GroupNorm(1, 16, eps=1e-5)
        p = gn.init(KEY, x)
        y = gn.apply(p, x)
        yt = torch.nn.GroupNorm(1, 16, eps=1e-5)(to_nchw(x))
        np.testing.assert_allclose(np.array(y), from_nchw(yt), atol=2e-6)

    def test_layernorm_matches_torch(self):
        x = random.normal(KEY, (2, 10, 32))
        ln = ops.LayerNorm(32)
        p = ln.init(KEY, x)
        y = ln.apply(p, x)
        yt = torch.nn.LayerNorm(32)(torch.tensor(np.array(x)))
        np.testing.assert_allclose(np.array(y), yt.detach().numpy(), atol=2e-6)

    def test_instance_norm(self):
        x = random.normal(KEY, (2, 6, 7, 16))
        y = ops.instance_norm_2d(x)
        yt = torch.nn.InstanceNorm2d(16)(to_nchw(x))
        np.testing.assert_allclose(np.array(y), from_nchw(yt), atol=2e-6)


class TestConv:
    @pytest.mark.parametrize("mode", ["zeros", "circular"])
    def test_conv2d_padding_modes(self, mode):
        x = random.normal(KEY, (2, 9, 11, 8))
        conv = ops.ConvND(16, 3, padding=1, padding_mode=mode)
        p = conv.init(KEY, x)
        y = conv.apply(p, x)
        w = np.array(p["params"]["kernel"])
        b = np.array(p["params"]["bias"])
        tc = torch.nn.Conv2d(8, 16, 3, padding=1, padding_mode=mode)
        tc.weight.data = torch.tensor(w).permute(3, 2, 0, 1)
        tc.bias.data = torch.tensor(b)
        yt = tc(to_nchw(x))
        np.testing.assert_allclose(np.array(y), from_nchw(yt), atol=1e-5)

    @pytest.mark.parametrize(
        "mode", ["zeros", "circular", "half_periodic_x", "half_periodic_y"])
    def test_upsample_2x_conv_matches_materialized(self, mode):
        """ConvND(upsample_2x=True) — the lhs-dilated fused lowering — must
        equal nearest-2x repeat followed by the same conv, per padding mode
        (reference op being fused: modules/basics.py:279-299 Upsample2D)."""
        x = random.normal(KEY, (2, 5, 7, 8))
        fused = ops.ConvND(16, 3, padding=1, padding_mode=mode, upsample_2x=True)
        p = fused.init(KEY, x)
        y = fused.apply(p, x)
        xup = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        plain = ops.ConvND(16, 3, padding=1, padding_mode=mode)
        y_ref = plain.apply(p, xup)
        assert y.shape == (2, 10, 14, 16)
        np.testing.assert_allclose(np.array(y), np.array(y_ref), atol=2e-5)

    @pytest.mark.parametrize(
        "mode,up",
        [("zeros", False), ("circular", False), ("half_periodic_x", False),
         ("zeros", True), ("circular", True), ("half_periodic_y", True)])
    def test_conv_gradients_match_torch(self, mode, up):
        """Input and kernel gradients of the TPU lowerings (wrap-strip
        decompose, fused lhs-dilated upsample) must match torch autograd —
        the stage-1 trainer differentiates through every one of these."""
        x = random.normal(KEY, (2, 6, 8, 4))
        conv = ops.ConvND(5, 3, padding=1, padding_mode=mode, upsample_2x=up)
        p = conv.init(KEY, x)

        def loss(xx, kk):
            pp = {"params": {**p["params"], "kernel": kk}}
            return jnp.sum(jnp.sin(conv.apply(pp, xx)))

        gx, gk = jax.grad(loss, argnums=(0, 1))(x, p["params"]["kernel"])

        w = torch.tensor(np.array(p["params"]["kernel"]),
                         requires_grad=True)
        b = torch.tensor(np.array(p["params"]["bias"]))
        xt = to_nchw(x).requires_grad_(True)
        xin = xt
        if up:
            xin = F.interpolate(xt, scale_factor=2, mode="nearest")
        if mode == "zeros":
            xp, pad = xin, 1
        elif mode == "circular":
            xp, pad = F.pad(xin, (1, 1, 1, 1), mode="circular"), 0
        elif mode == "half_periodic_x":
            xp = F.pad(xin, (1, 1, 0, 0), mode="circular")
            xp, pad = F.pad(xp, (0, 0, 1, 1)), 0
        else:  # half_periodic_y
            xp = F.pad(xin, (0, 0, 1, 1), mode="circular")
            xp, pad = F.pad(xp, (1, 1, 0, 0)), 0
        yt = F.conv2d(xp, w.permute(3, 2, 0, 1), b, padding=pad)
        torch.sum(torch.sin(yt)).backward()

        np.testing.assert_allclose(np.array(gx), xt.grad.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-5, atol=3e-5)
        np.testing.assert_allclose(np.array(gk), w.grad.numpy(),
                                   rtol=1e-5, atol=3e-5)

    def test_dilated_conv(self):
        x = random.normal(KEY, (2, 8, 8, 4))
        conv = ops.ConvND(4, 3, padding=2, dilation=2, padding_mode="circular")
        p = conv.init(KEY, x)
        y = conv.apply(p, x)
        w = np.array(p["params"]["kernel"])
        b = np.array(p["params"]["bias"])
        tc = torch.nn.Conv2d(4, 4, 3, padding=2, dilation=2, padding_mode="circular")
        tc.weight.data = torch.tensor(w).permute(3, 2, 0, 1)
        tc.bias.data = torch.tensor(b)
        np.testing.assert_allclose(np.array(y), from_nchw(tc(to_nchw(x))), atol=1e-5)

    @pytest.mark.parametrize("direction", ["x", "y"])
    def test_half_periodic_conv(self, direction):
        x = random.normal(KEY, (2, 10, 14, 8))
        hp = ops.HalfPeriodicConv2d(8, 3, padding=1, periodic_direction=direction)
        p = hp.init(KEY, x)
        y = hp.apply(p, x)
        w = torch.tensor(np.array(p["params"]["conv"]["kernel"])).permute(3, 2, 0, 1)
        b = torch.tensor(np.array(p["params"]["conv"]["bias"]))
        xt = to_nchw(x)
        if direction == "x":
            xt = F.pad(xt, (1, 1, 0, 0), mode="circular")
            xt = F.pad(xt, (0, 0, 1, 1), mode="constant", value=0)
        else:
            xt = F.pad(xt, (0, 0, 1, 1), mode="circular")
            xt = F.pad(xt, (1, 1, 0, 0), mode="constant", value=0)
        yt = F.conv2d(xt, w, b)
        np.testing.assert_allclose(np.array(y), from_nchw(yt), atol=1e-5)

    def test_conv1d_and_3d(self):
        x1 = random.normal(KEY, (2, 16, 4))
        c1 = ops.ConvND(8, 3, num_dimensions=1, padding=1, padding_mode="circular")
        p = c1.init(KEY, x1)
        y = c1.apply(p, x1)
        assert y.shape == (2, 16, 8)
        x3 = random.normal(KEY, (1, 6, 6, 6, 4))
        c3 = ops.ConvND(8, 3, num_dimensions=3, padding=1)
        p = c3.init(KEY, x3)
        assert c3.apply(p, x3).shape == (1, 6, 6, 6, 8)


class TestSampling:
    def test_upsample_2x_matches_torch(self):
        x = random.normal(KEY, (1, 7, 9, 4))
        y = upsample_nearest_2x(x)
        yt = F.interpolate(to_nchw(x), scale_factor=2.0)
        np.testing.assert_array_equal(np.array(y), from_nchw(yt))

    @pytest.mark.parametrize(
        "in_hw,out_hw", [((28, 60), (61, 121)), ((48, 96), (96, 192)), ((32, 32), (64, 64))]
    )
    def test_exact_resize_matches_torch(self, in_hw, out_hw):
        x = random.normal(KEY, (1, *in_hw, 3))
        y = resize_nearest_torch(x, *out_hw)
        yt = F.interpolate(to_nchw(x), size=out_hw, mode="nearest")
        np.testing.assert_array_equal(np.array(y), from_nchw(yt))


class TestDownsampleArithmetic:
    def test_asymmetric_zeros_halving(self):
        # two-phase trace: 61 -> 30 -> 15 -> 7 (h), 121 -> 60 -> 30 -> 15 (w)
        x = random.normal(KEY, (1, 61, 121, 32))
        ds = ops.DownSampleBlock(32, 2, "zeros")
        p = ds.init(KEY, x)
        shapes = []
        for _ in range(3):
            x = ds.apply(p, x)
            shapes.append(x.shape[1:3])
        assert shapes == [(30, 60), (15, 30), (7, 15)]

    def test_circular_halving(self):
        x = random.normal(KEY, (1, 64, 64, 32))
        ds = ops.DownSampleBlock(32, 2, "circular")
        p = ds.init(KEY, x)
        assert ds.apply(p, x).shape[1:3] == (32, 32)


class TestSpectral:
    def test_spectral2d_matches_direct_dft(self):
        x = random.normal(KEY, (2, 16, 16, 8))
        sc = ops.SpectralConv2d(8, 8, 4, 4)
        p = sc.init(KEY, x)
        y = sc.apply(p, x)
        w1 = torch.view_as_complex(torch.tensor(np.array(p["params"]["weights1"])))
        w2 = torch.view_as_complex(torch.tensor(np.array(p["params"]["weights2"])))
        x_ft = torch.fft.rfft2(to_nchw(x))
        out_ft = torch.zeros(2, 8, 16, 9, dtype=torch.cfloat)
        out_ft[:, :, :4, :4] = torch.einsum("bixy,ioxy->boxy", x_ft[:, :, :4, :4], w1)
        out_ft[:, :, -4:, :4] = torch.einsum("bixy,ioxy->boxy", x_ft[:, :, -4:, :4], w2)
        yt = torch.fft.irfft2(out_ft, s=(16, 16))
        np.testing.assert_allclose(np.array(y), from_nchw(yt), atol=1e-5)

    def test_spectral1d_shape(self):
        x = random.normal(KEY, (2, 32, 4))
        sc = ops.SpectralConv1d(4, 6, 8)
        p = sc.init(KEY, x)
        assert sc.apply(p, x).shape == (2, 32, 6)

    def test_spectral3d_shape(self):
        x = random.normal(KEY, (1, 8, 8, 8, 4))
        sc = ops.SpectralConv3d(4, 4, 2, 2, 2)
        p = sc.init(KEY, x)
        assert sc.apply(p, x).shape == (1, 8, 8, 8, 4)


class TestLosses:
    def test_relative_lp_matches_reference_semantics(self):
        a = random.normal(KEY, (4, 3, 10, 12))
        b = random.normal(random.PRNGKey(1), (4, 3, 10, 12))
        at, bt = torch.tensor(np.array(a)), torch.tensor(np.array(b))
        r = np.array(ops.relative_lp_loss(a, b, reduce_dim=(-1, -2), p=2, reduce_all=True))
        gt_norm = (bt**2).sum(dim=(-1, -2))
        gt_norm[gt_norm < 1e-8] = 1e-8
        rt = (((at - bt) ** 2).sum(dim=(-1, -2)) / gt_norm).sqrt().mean().item()
        assert abs(r - rt) < 1e-6

    def test_relative_lp_eps_floor(self):
        pred = jnp.ones((1, 1, 4, 4))
        gt = jnp.zeros((1, 1, 4, 4))
        r = ops.relative_lp_loss(pred, gt, reduce_dim=(-1, -2), reduce_all=True)
        assert np.isfinite(float(r))

    def test_smooth_l1_matches_torch(self):
        a = random.normal(KEY, (5, 7)) * 3
        b = random.normal(random.PRNGKey(1), (5, 7))
        s = np.array(ops.smooth_l1_loss(a, b))
        st = F.smooth_l1_loss(torch.tensor(np.array(a)), torch.tensor(np.array(b))).item()
        assert abs(s - st) < 1e-6

    def test_gradient_domain_loss_finite(self):
        a = random.normal(KEY, (2, 8, 8, 4))
        b = random.normal(random.PRNGKey(1), (2, 8, 8, 4))
        v = float(ops.gradient_domain_loss(a, b))
        assert np.isfinite(v)


class TestEmbeddings:
    def test_fourier_embedding_matches_reference_formula(self):
        t = jnp.array([0.3, 1.7])
        emb = ops.fourier_embedding(t, 16)
        import math

        half = 8
        freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
        args = torch.tensor(np.array(t))[:, None] * freqs[None]
        et = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        np.testing.assert_allclose(np.array(emb), et.numpy(), atol=1e-6)

    def test_rotary_identity_at_zero(self):
        q = random.normal(KEY, (1, 2, 4, 8))
        freqs = jnp.zeros((1, 2, 4, 8))
        np.testing.assert_allclose(np.array(ops.apply_rotary_pos_emb(q, freqs)), np.array(q))

    def test_rotate_half(self):
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        np.testing.assert_array_equal(np.array(ops.rotate_half(x)), [[-3.0, -4.0, 1.0, 2.0]])

    def test_sirennet_runs(self):
        net = ops.SirenNet(dim_in=2, dim_hidden=16, dim_out=4, num_layers=2)
        x = random.normal(KEY, (3, 5, 2))
        p = net.init(KEY, x)
        assert net.apply(p, x).shape == (3, 5, 4)


class TestAttentionShapes:
    def test_sablock_spatial_and_tokens(self):
        x = random.normal(KEY, (2, 8, 12, 64))
        sab = ops.SABlock(64, 8, 16, use_pe=True, block_size=96)
        p = sab.init(KEY, x)
        assert sab.apply(p, x).shape == x.shape
        tok = x.reshape(2, 96, 64)
        assert sab.apply(p, tok).shape == (2, 96, 64)

    def test_cablock(self):
        x = random.normal(KEY, (2, 4, 6, 32))
        ctx = random.normal(KEY, (2, 5, 16))
        cab = ops.CABlock(32, 16, 4, 8)
        p = cab.init(KEY, x, ctx)
        assert cab.apply(p, x, ctx).shape == x.shape

    def test_fablock(self):
        x = random.normal(KEY, (2, 8, 12, 64))
        fab = ops.FABlock2D(64, 16, 16, 4, 64)
        p = fab.init(KEY, x)
        assert fab.apply(p, x).shape == x.shape


class TestSpectralDFTMatmul:
    @pytest.mark.parametrize("h,w,m1,m2", [(16, 16, 4, 4), (61, 121, 6, 12), (32, 32, 4, 17)])
    def test_dft_matmul_matches_fft_path(self, h, w, m1, m2):
        """MXU DFT-matmul path == rfft2 path, incl. odd sizes + nyquist col."""
        from lns_tpu.ops.spectral import spectral_conv2d_dft

        x = random.normal(KEY, (2, h, w, 8))
        sc = ops.SpectralConv2d(8, 8, m1, m2)
        p = sc.init(KEY, x)
        y_fft = sc.apply(p, x)
        y_dft = spectral_conv2d_dft(
            x, p["params"]["weights1"], p["params"]["weights2"], m1, m2
        )
        np.testing.assert_allclose(np.array(y_dft), np.array(y_fft), atol=1e-5)

    def test_module_flag(self):
        x = random.normal(KEY, (2, 16, 16, 8))
        sc1 = ops.SpectralConv2d(8, 8, 4, 4)
        sc2 = ops.SpectralConv2d(8, 8, 4, 4, use_dft_matmul=True)
        p = sc1.init(KEY, x)
        np.testing.assert_allclose(np.array(sc2.apply(p, x)), np.array(sc1.apply(p, x)),
                                   atol=1e-5)
