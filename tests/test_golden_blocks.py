"""Block-level golden tests: execute the upstream reference's torch modules
(via the import shim) and assert numerical parity with our blocks after
weight conversion."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import lns_tpu.ops as ops
from lns_tpu.utils import torch_compat as tc

from _reference import load_reference

REF = load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference unavailable")

KEY = jax.random.PRNGKey(0)


def nchw(x):
    return torch.tensor(np.array(x)).permute(0, 3, 1, 2)


def nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def reader(module):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return tc._Reader(sd)


def test_residual_block_parity():
    torch.manual_seed(0)
    rb = REF.basics.ResidualBlock(32, 64, 2, padding_mode="circular").eval()
    r = reader(rb)
    params = {
        "gn1": tc._norm(r, "block.0.gn"),
        "conv1": tc._conv(r, "block.2"),
        "gn2": tc._norm(r, "block.3.gn"),
        "conv2": tc._conv(r, "block.5"),
        "channel_up": tc._conv(r, "channel_up", pointwise=True),
    }
    jrb = ops.ResidualBlock(32, 64, 2, padding_mode="circular")
    x = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        yt = rb(x)
    yj = jrb.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_sablock_parity():
    torch.manual_seed(0)
    sab = REF.basics.SABlock(64, 8, 16, use_pe=True, block_size=64).eval()
    r = reader(sab)
    params = {
        "ln": tc._norm(r, "ln"),
        "to_q": tc._linear(r, "to_q", bias=False),
        "to_k": tc._linear(r, "to_k", bias=False),
        "to_v": tc._linear(r, "to_v"),
        "proj_out": tc._linear(r, "proj_out"),
        "pe": r.take("pe"),
    }
    jsab = ops.SABlock(64, 8, 16, use_pe=True, block_size=64)
    x = torch.randn(2, 64, 8, 8)
    with torch.no_grad():
        yt = sab(x)
    yj = jsab.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_fablock_parity():
    torch.manual_seed(0)
    fab = REF.factorized_attention.FABlock2D(64, 32, 32, 4, 64).eval()
    r = reader(fab)
    params = {
        "in_norm": tc._norm(r, "in_norm"),
        "in_proj": tc._conv(r, "in_proj", pointwise=True, bias=False),
        "to_in": tc._conv(r, "to_in.0", pointwise=True, bias=False),
        "to_x": tc._pooling_reducer(r, "to_x.0"),
        "to_y": tc._pooling_reducer(r, "to_y.1"),
        "low_rank_kernel_x": tc._lowrank(r, "low_rank_kernel_x"),
        "low_rank_kernel_y": tc._lowrank(r, "low_rank_kernel_y"),
        "out_fc1": tc._conv(r, "to_out.1", pointwise=True, bias=False),
        "out_fc2": tc._conv(r, "to_out.3", pointwise=True, bias=False),
    }
    jfab = ops.FABlock2D(64, 32, 32, 4, 64)
    x = torch.randn(2, 64, 12, 24)
    with torch.no_grad():
        yt = fab(x)
    yj = jfab.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_spectral_conv2d_parity():
    torch.manual_seed(0)
    sc = REF.basics.SpectralConv2d(8, 16, 4, 5).eval()
    r = reader(sc)
    params = {"weights1": r.take("weights1"), "weights2": r.take("weights2")}
    jsc = ops.SpectralConv2d(8, 16, 4, 5)
    x = torch.randn(2, 8, 16, 20)
    with torch.no_grad():
        yt = sc(x)
    yj = jsc.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_fourier_basic_block_parity():
    torch.manual_seed(0)
    fb = REF.basics.FourierBasicBlock(16, 16, modes=[4, 4]).eval()
    r = reader(fb)
    params = {
        "fourier": {"weights1": r.take("fourier.weights1"), "weights2": r.take("fourier.weights2")},
        "conv": tc._conv(r, "conv", pointwise=True),
    }
    jfb = ops.FourierBasicBlock(16, 16, (4, 4))
    x = torch.randn(2, 16, 16, 16)
    with torch.no_grad():
        yt = fb(x)
    yj = jfb.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_cond_residual_block_parity():
    torch.manual_seed(0)
    cb = REF.cond_utils.CondResidualBlock(32, 64, cond_channels=16, norm=True).eval()
    # zero-init conv2 means output == shortcut-dominated; perturb conv2 so the
    # test exercises the full path.
    with torch.no_grad():
        cb.conv2.weight.normal_(0, 0.02)
        cb.conv2.bias.normal_(0, 0.02)
    r = reader(cb)
    params = {
        "conv1": tc._conv(r, "conv1"),
        "conv2": tc._conv(r, "conv2"),
        "shortcut": tc._conv(r, "shortcut", pointwise=True),
        "norm1": tc._norm(r, "norm1"),
        "norm2": tc._norm(r, "norm2"),
        "cond_emb": tc._linear(r, "cond_emb"),
    }
    jcb = ops.CondResidualBlock(32, 64, cond_channels=16, norm=True)
    x = torch.randn(2, 32, 8, 8)
    emb = torch.randn(2, 16)
    with torch.no_grad():
        yt = cb(x, emb)
    yj = jcb.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(nhwc(x)),
        jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_cond_fourier_basic_block_parity():
    torch.manual_seed(0)
    cf = REF.fourier_cond.CondFourierBasicBlock(16, 16, modes=[4, 4]).eval()
    r = reader(cf)
    params = {
        "fourier": {
            "weights1": r.take("fourier.weights1"),
            "weights2": r.take("fourier.weights2"),
            "cond_emb": {
                "weights": r.take("fourier.cond_emb.weights"),
                "bias": r.take("fourier.cond_emb.bias"),
            },
        },
        "conv": tc._conv(r, "conv", pointwise=True),
        "cond_emb": tc._linear(r, "cond_emb"),
    }
    from lns_tpu.ops.fourier_cond import CondFourierBasicBlock

    jcf = CondFourierBasicBlock(16, 16, (4, 4))
    x = torch.randn(2, 16, 16, 16)
    emb = torch.randn(2, 16)
    with torch.no_grad():
        yt = cf(x, emb)
    yj = jcf.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(nhwc(x)),
        jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_fourier_embedding_parity():
    t = torch.tensor([0.25, 0.9])
    et = REF.cond_utils.fourier_embedding(t, 64)
    ej = ops.fourier_embedding(jnp.asarray(t.numpy()), 64)
    np.testing.assert_allclose(np.array(ej), et.numpy(), atol=1e-6)


def test_rotary_parity():
    emb = REF.embedding.RotaryEmbedding(32)
    pos = torch.linspace(0, 1, 7).view(1, 7)
    ft = emb(pos, "cpu")
    from lns_tpu.ops.embedding import rotary_freqs

    fj = rotary_freqs(jnp.asarray(pos.numpy()), 32)
    np.testing.assert_allclose(np.array(fj), ft.numpy(), atol=1e-6)

    q = torch.randn(1, 2, 7, 32)
    yt = REF.embedding.apply_rotary_pos_emb(q, ft.repeat(2, 1, 1)[None])
    yj = ops.apply_rotary_pos_emb(
        jnp.asarray(q.numpy()), jnp.broadcast_to(np.array(fj)[:, None], (1, 2, 7, 32))
    )
    np.testing.assert_allclose(np.array(yj), yt.numpy(), atol=1e-5)


def test_lablock_parity():
    torch.manual_seed(0)
    lab = REF.basics.LABlock(64, 4, 16, use_pe=True, block_size=64).eval()
    r = reader(lab)
    params = {
        "ln": tc._norm(r, "ln"),
        "to_q": tc._linear(r, "to_q", bias=False),
        "to_k": tc._linear(r, "to_k", bias=False),
        "to_v": tc._linear(r, "to_v"),
        "proj_out": tc._linear(r, "proj_out"),
        "pe": r.take("pe"),
    }
    jlab = ops.LABlock(64, 4, 16, use_pe=True, block_size=64)
    x = torch.randn(2, 64, 8, 8)
    with torch.no_grad():
        yt = lab(x)
    yj = jlab.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_cablock_parity():
    """Reference CABlock un-reshape condition is inverted (basics.py:526):
    with channel_last=False it returns token-shaped [b, n, c]; our fixed
    block restores spatial layout — compare on the flattened tokens."""
    torch.manual_seed(0)
    cab = REF.basics.CABlock(32, 16, 4, 8).eval()
    r = reader(cab)
    params = {
        "ln_x": tc._norm(r, "ln_x"),
        "ln_y": tc._norm(r, "ln_y"),
        "to_q": tc._linear(r, "to_q", bias=False),
        "to_k": tc._linear(r, "to_k", bias=False),
        "to_v": tc._linear(r, "to_v"),
        "proj_out": tc._linear(r, "proj_out"),
    }
    jcab = ops.CABlock(32, 16, 4, 8)
    x = torch.randn(2, 32, 4, 6)
    ctx = torch.randn(2, 5, 16)
    with torch.no_grad():
        yt = cab(x, ctx)  # [b, n, c] due to the reference bug
    yj = jcab.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(nhwc(x)),
        jnp.asarray(ctx.numpy()),
    )
    yj_tokens = np.array(yj).reshape(2, 24, 32)
    np.testing.assert_allclose(yj_tokens, yt.numpy(), atol=1e-5)


def test_resfno_mixer_parity():
    torch.manual_seed(0)
    mx = REF.basics.ResFNOMixerBlock(16, 16, modes=[4, 4], norm="in").eval()
    r = reader(mx)
    params = {
        "token_mixer": {"weights1": r.take("token_mixer.weights1"),
                        "weights2": r.take("token_mixer.weights2")},
        "cm_norm": tc._norm(r, "channel_mixer.0"),
        "cm_fc1": tc._conv(r, "channel_mixer.1", pointwise=True),
        "cm_fc2": tc._conv(r, "channel_mixer.3", pointwise=True),
    }
    from lns_tpu.ops.fno import ResFNOMixerBlock

    jmx = ResFNOMixerBlock(16, 16, (4, 4), norm="in")
    x = torch.randn(2, 16, 16, 16)
    with torch.no_grad():
        yt = mx(x)
    yj = jmx.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_cond_resfno_mixer_parity():
    torch.manual_seed(0)
    mx = REF.basics.CondResFNOMixerBlock(16, 16, modes=[4, 4], norm="in").eval()
    with torch.no_grad():  # exercise the zero-init gate
        mx.cond_conv[2].weight.normal_(0, 0.05)
        mx.cond_conv[2].bias.normal_(0, 0.05)
    r = reader(mx)
    params = {
        "token_mixer": {"weights1": r.take("token_mixer.weights1"),
                        "weights2": r.take("token_mixer.weights2")},
        "cm_norm": tc._norm(r, "channel_mixer.0"),
        "cm_fc1": tc._conv(r, "channel_mixer.1", pointwise=True),
        "cm_fc2": tc._conv(r, "channel_mixer.3", pointwise=True),
        "cond_fc1": tc._conv(r, "cond_conv.0", pointwise=True),
        "cond_fc2": tc._conv(r, "cond_conv.2", pointwise=True),
    }
    from lns_tpu.ops.fno import CondResFNOMixerBlock

    jmx = CondResFNOMixerBlock(16, 16, (4, 4), norm="in")
    x = torch.randn(2, 16, 16, 16)
    emb = torch.randn(2, 16)
    with torch.no_grad():
        yt = mx(x, emb)
    yj = jmx.apply({"params": jax.tree.map(jnp.asarray, params)},
                   jnp.asarray(nhwc(x)), jnp.asarray(emb.numpy()))
    np.testing.assert_allclose(np.array(yj), nhwc(yt), atol=1e-5)


def test_sirennet_parity():
    torch.manual_seed(0)
    net = REF.embedding.SirenNet(dim_in=2, dim_hidden=32, dim_out=4,
                                 num_layers=3, normalize_input=True).eval()
    r = reader(net)
    params = {}
    for i in range(3):
        params[f"siren_{i}"] = {
            "kernel": r.take(f"layers.{i}.weight").T,
            "bias": r.take(f"layers.{i}.bias"),
        }
    params["last_layer"] = tc._linear(r, "last_layer")
    jnet = ops.SirenNet(dim_in=2, dim_hidden=32, dim_out=4, num_layers=3,
                        normalize_input=True)
    x = torch.rand(2, 7, 2)
    with torch.no_grad():
        yt = net(x)
    yj = jnet.apply({"params": jax.tree.map(jnp.asarray, params)},
                    jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.array(yj), yt.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# 1D / 3D variants (VERDICT round 2 item 5): executed-against-torch parity
# for the dormant dimensionalities (reference modules/basics.py:55-96,
# 152-221, 224-276).

def _to_cl(t, nd):
    """torch channels-first [b, c, *s] -> channels-last numpy [b, *s, c]."""
    perm = (0,) + tuple(range(2, 2 + nd)) + (1,)
    return t.permute(*perm).detach().numpy()


def test_spectral_conv1d_parity():
    # NOTE: the reference forward crashes as published — basics.py:95 passes
    # n=(x.size(-1),) (a tuple) to torch.fft.irfft, which requires an int.
    # We execute the reference's own spectral pipeline (its batchmul1d and
    # weight layout) with the intended scalar n — the only runnable reading.
    torch.manual_seed(0)
    sc = REF.basics.SpectralConv1d(8, 16, 4).eval()
    r = reader(sc)
    params = {"weights": r.take("weights")}
    jsc = ops.SpectralConv1d(8, 16, 4)
    x = torch.randn(2, 8, 20)
    with torch.no_grad():
        x_ft = torch.fft.rfft(x)
        out_ft = torch.zeros(2, 16, x.size(-1) // 2 + 1, dtype=torch.cfloat)
        out_ft[:, :, :4] = REF.basics.batchmul1d(
            x_ft[:, :, :4], torch.view_as_complex(sc.weights))
        yt = torch.fft.irfft(out_ft, n=x.size(-1))
    yj = jsc.apply({"params": jax.tree.map(jnp.asarray, params)},
                   jnp.asarray(_to_cl(x, 1)))
    np.testing.assert_allclose(np.array(yj), _to_cl(yt, 1), atol=1e-5)


def test_spectral_conv3d_parity():
    torch.manual_seed(0)
    sc = REF.basics.SpectralConv3d(4, 8, 2, 3, 2).eval()
    r = reader(sc)
    params = {f"weights{i}": r.take(f"weights{i}") for i in range(1, 5)}
    jsc = ops.SpectralConv3d(4, 8, 2, 3, 2)
    x = torch.randn(2, 4, 6, 8, 8)
    with torch.no_grad():
        yt = sc(x)
    yj = jsc.apply({"params": jax.tree.map(jnp.asarray, params)},
                   jnp.asarray(_to_cl(x, 3)))
    np.testing.assert_allclose(np.array(yj), _to_cl(yt, 3), atol=1e-5)


def _conv_nd(r, prefix, nd):
    """torch ConvNd weight [O, I, *K] -> channels-last [*K, I, O]."""
    w = r.take(prefix + ".weight")
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return {"kernel": np.transpose(w, perm), "bias": r.take(prefix + ".bias")}


@pytest.mark.parametrize("nd,pad", [(1, "circular"), (1, "zeros"), (3, "zeros")])
def test_residual_block_1d_3d_parity(nd, pad):
    torch.manual_seed(0)
    rb = REF.basics.ResidualBlock(32, 64, nd, padding_mode=pad).eval()
    r = reader(rb)
    params = {
        "gn1": tc._norm(r, "block.0.gn"),
        "conv1": _conv_nd(r, "block.2", nd),
        "gn2": tc._norm(r, "block.3.gn"),
        "conv2": _conv_nd(r, "block.5", nd),
        # 1x1 ConvNd weight [O, I, 1*nd] -> plain (I, O) matrix
        "channel_up": {"kernel": r.take("channel_up.weight").reshape(64, 32).T,
                       "bias": r.take("channel_up.bias")},
    }
    jrb = ops.ResidualBlock(32, 64, nd, padding_mode=pad)
    shape = {1: (2, 32, 16), 3: (2, 32, 6, 6, 6)}[nd]
    x = torch.randn(*shape)
    with torch.no_grad():
        yt = rb(x)
    yj = jrb.apply({"params": jax.tree.map(jnp.asarray, params)},
                   jnp.asarray(_to_cl(x, nd)))
    np.testing.assert_allclose(np.array(yj), _to_cl(yt, nd), atol=1e-5)
