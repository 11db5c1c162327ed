"""Full-model golden tests: reference torch autoencoders / propagators /
latent dynamics vs our converted JAX models, on the shipped configs."""

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from lns_tpu.config import Config, load_config
from lns_tpu.models import LatentDynamics, SimpleAutoencoder
from lns_tpu.models.propagator import CondSimpleCNN, SimpleCNN
from lns_tpu.utils.torch_compat import (
    convert_autoencoder,
    convert_latent_dynamics,
    convert_propagator,
    to_jax,
)

from _reference import load_reference, reference_namespace

REF = load_reference()
pytestmark = [pytest.mark.slow, pytest.mark.skipif(REF is None, reason="reference unavailable")]

CFG_DIR = "/root/reference/configs"

AE_CASES = [
    ("ns2d_atage1_ae", "autoencoder2d", (1, 1, 64, 64)),
    ("SW_stage1_ae", "autoencoder2d_half_periodic", (1, 3, 96, 192)),
    ("twophase_stage1_ae", "autoencoder2d_nonsquared", (1, 4, 61, 121)),
]


def _torch_ae(cfg_name, mod_name):
    raw = yaml.safe_load(open(f"{CFG_DIR}/{cfg_name}.yml"))
    raw.setdefault("disable_coarse_attn", None)
    raw.setdefault("use_attn_enc", None)
    ns = reference_namespace(raw)
    mod = getattr(REF, mod_name)
    return mod.SimpleAutoencoder(ns).eval()


@pytest.mark.parametrize("cfg_name,mod_name,shape", AE_CASES)
def test_autoencoder_param_count_matches(cfg_name, mod_name, shape):
    torch.manual_seed(0)
    tae = _torch_ae(cfg_name, mod_name)
    n_torch = sum(p.numel() for p in tae.parameters())
    cfg = load_config(f"{CFG_DIR}/{cfg_name}.yml")
    jae = SimpleAutoencoder(cfg)
    v = jae.init(jax.random.PRNGKey(0), jnp.zeros((1, shape[2], shape[3], shape[1])))
    n_jax = sum(p.size for p in jax.tree.leaves(v))
    assert n_jax == n_torch


@pytest.mark.parametrize("cfg_name,mod_name,shape", AE_CASES)
def test_autoencoder_forward_parity(cfg_name, mod_name, shape):
    torch.manual_seed(0)
    tae = _torch_ae(cfg_name, mod_name)
    sd = {k: v.detach().numpy() for k, v in tae.state_dict().items()}
    cfg = load_config(f"{CFG_DIR}/{cfg_name}.yml")
    jae = SimpleAutoencoder(cfg)
    params = to_jax(convert_autoencoder(cfg, sd))

    x = torch.randn(*shape)
    with torch.no_grad():
        zt = tae.encode(x)
        yt = tae(x)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    zj = jae.apply({"params": params}, xj, method=SimpleAutoencoder.encode)
    yj = jae.apply({"params": params}, xj)
    np.testing.assert_allclose(np.array(zj), zt.numpy().transpose(0, 2, 3, 1), atol=3e-5)
    np.testing.assert_allclose(np.array(yj), yt.numpy().transpose(0, 2, 3, 1), atol=3e-4)


PROP_CASES = [
    ("train_stage2_ns2d", "circular", (2, 8, 8), 16, 3, 2, dict(resolution=64, is_periodic=True)),
    ("train_stage2_SW", "half_periodic_x", (2, 12, 24), 64, 4, 3, dict(periodic_direction="x")),
    ("train_stage2_twophase", "zeros", (2, 7, 15), 64, 4, 2,
     dict(resolutions=[61, 121], is_periodic=False)),
]


@pytest.mark.parametrize("tname,pm,shape,ld,nblock,dil,extra", PROP_CASES)
def test_propagator_forward_parity(tname, pm, shape, ld, nblock, dil, extra):
    torch.manual_seed(0)
    t = REF.trainers[tname]
    assert t is not None
    tprop = t.SimpleCNN(latent_dim=ld, prop_n_block=nblock, prop_n_embd=128, dilation=dil).eval()
    sd = {k: v.detach().numpy() for k, v in tprop.state_dict().items()}
    cfg = Config(latent_dim=ld, prop_n_block=nblock, prop_n_embd=128, dilation=dil, **extra)
    params = to_jax(convert_propagator(cfg, sd, prefix=""))
    jprop = SimpleCNN(latent_dim=ld, prop_n_block=nblock, prop_n_embd=128,
                      dilation=dil, padding_mode=pm)
    z = torch.randn(shape[0], ld, shape[1], shape[2])
    with torch.no_grad():
        yt = tprop(z)
    yj = jprop.apply({"params": params}, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.array(yj), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_conditional_propagator_parity():
    torch.manual_seed(0)
    t = REF.trainers["train_stage2_twophase_conditional"]
    tprop = t.SimpleCNN(latent_dim=64, cond_emb_dim=64, prop_n_block=4,
                        prop_n_embd=128, dilation=2).eval()
    sd = {k: v.detach().numpy() for k, v in tprop.state_dict().items()}
    cfg = Config(latent_dim=64, prop_n_block=4, prop_n_embd=128, dilation=2,
                 resolutions=[61, 121], is_periodic=False, cond_channels=1)
    params = to_jax(convert_propagator(cfg, sd, prefix=""))
    jprop = CondSimpleCNN(latent_dim=64, cond_emb_dim=64, prop_n_block=4,
                          prop_n_embd=128, dilation=2, padding_mode="zeros")
    z = torch.randn(2, 64, 7, 15)
    param = torch.rand(2)
    with torch.no_grad():
        yt = tprop(z, param)
    yj = jprop.apply({"params": params}, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)),
                     jnp.asarray(param.numpy()))
    np.testing.assert_allclose(np.array(yj), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_latent_dynamics_rollout_parity():
    """Fused scan rollout (encode -> steps -> decode) vs the reference's
    Python-loop LatentDynamics.predict on the NS2d config."""
    torch.manual_seed(0)
    t = REF.trainers["train_stage2_ns2d"]
    raw = yaml.safe_load(open(f"{CFG_DIR}/ns2d_stage2_prop.yml"))
    raw.setdefault("use_attn_enc", None)
    ns = reference_namespace(raw)
    tmodel = t.LatentDynamics(ns).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = load_config(f"{CFG_DIR}/ns2d_stage2_prop.yml")
    jmodel = LatentDynamics(cfg)
    params = to_jax(convert_latent_dynamics(cfg, sd))

    x = torch.randn(2, 1, 64, 64)
    steps = 5
    with torch.no_grad():
        yt = tmodel.predict(x, steps, to_x=True)  # [b, t, c, h, w]
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    yj = jmodel.predict({"params": params}, xj, steps, to_x=True)  # [b, t, h, w, c]
    np.testing.assert_allclose(
        np.array(yj), yt.numpy().transpose(0, 1, 3, 4, 2), atol=3e-4
    )


def test_latent_dynamics_predict_pallas_golden():
    """The FULL fused `predict()` with the Pallas rollout path FORCED
    (interpret mode off-TPU) and the chunked batched decode, vs the
    executed reference's decode-in-loop predict
    (train_stage2_ns2d.py:143-158) — closes the benchmark path against the
    reference directly rather than transitively via
    test_fused_rollout_matches_scan."""
    torch.manual_seed(0)
    t = REF.trainers["train_stage2_ns2d"]
    raw = yaml.safe_load(open(f"{CFG_DIR}/ns2d_stage2_prop.yml"))
    raw.setdefault("use_attn_enc", None)
    ns = reference_namespace(raw)
    tmodel = t.LatentDynamics(ns).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = load_config(f"{CFG_DIR}/ns2d_stage2_prop.yml")
    jmodel = LatentDynamics(cfg)
    params = to_jax(convert_latent_dynamics(cfg, sd))

    x = torch.randn(2, 1, 64, 64)
    steps = 5
    with torch.no_grad():
        yt = tmodel.predict(x, steps, to_x=True)  # [b, t, c, h, w]
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    yj = jmodel.predict({"params": params}, xj, steps, to_x=True,
                        decode_chunk=4, use_pallas=True,
                        pallas_interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(
        np.array(yj), yt.numpy().transpose(0, 1, 3, 4, 2), atol=5e-4
    )


def test_latent_dynamics_training_loss_parity():
    """Rollout training loss (scan + smooth-L1) vs reference forward()."""
    torch.manual_seed(0)
    t = REF.trainers["train_stage2_ns2d"]
    raw = yaml.safe_load(open(f"{CFG_DIR}/ns2d_stage2_prop.yml"))
    raw.setdefault("use_attn_enc", None)
    ns = reference_namespace(raw)
    tmodel = t.LatentDynamics(ns).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = load_config(f"{CFG_DIR}/ns2d_stage2_prop.yml")
    jmodel = LatentDynamics(cfg)
    params = to_jax(convert_latent_dynamics(cfg, sd))

    z_in = torch.randn(4, 1, 16, 8, 8)
    z_out = torch.randn(4, 2, 16, 8, 8)
    with torch.no_grad():
        import torch.nn.functional as F

        lt = tmodel(z_in, z_out, F.smooth_l1_loss).item()
    lj = float(
        jmodel.rollout_loss(
            {"params": params},
            jnp.asarray(z_in.numpy().transpose(0, 1, 3, 4, 2)),
            jnp.asarray(z_out.numpy().transpose(0, 1, 3, 4, 2)),
        )
    )
    assert abs(lj - lt) < 1e-5


def test_conditional_autoencoder_builds():
    from lns_tpu.models import ConditionalSimpleAutoencoder

    cfg = load_config(f"{CFG_DIR}/twophase_stage2_cond_prop.yml")
    cae = ConditionalSimpleAutoencoder(cfg)
    x = jnp.zeros((2, 61, 121, 4))
    p = jnp.zeros((2,))
    v = cae.init(jax.random.PRNGKey(0), x, p)
    y = cae.apply(v, x, p)
    assert y.shape == x.shape


def test_cond_encoder_parity():
    torch.manual_seed(0)
    raw = yaml.safe_load(open(f"{CFG_DIR}/twophase_stage2_cond_prop.yml"))
    raw.setdefault("disable_coarse_attn", None)
    ns = reference_namespace(raw)
    tenc = REF.autoencoder2d_nonsquared.CondEncoder(ns).eval()
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}

    from lns_tpu.models import CondEncoder
    from lns_tpu.utils.torch_compat import convert_cond_encoder

    cfg = load_config(f"{CFG_DIR}/twophase_stage2_cond_prop.yml")
    jenc = CondEncoder(cfg)
    params = to_jax(convert_cond_encoder(cfg, sd, prefix=""))
    x = torch.randn(2, 4, 61, 121)
    param = torch.rand(2)
    with torch.no_grad():
        yt = tenc(x, param)
    yj = jenc.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(param.numpy()))
    np.testing.assert_allclose(np.array(yj), yt.numpy().transpose(0, 2, 3, 1), atol=3e-5)
