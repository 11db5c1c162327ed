"""Golden tests for config branches the shipped configs leave dormant:
encoder attention (use_attn_enc), softmax SA instead of factorized attention
(use_fa=False), fourier_resolutions levels, final_smoothing, and
disable_coarse_attn — all compared against the executed reference."""

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from lns_tpu.config import Config, load_config
from lns_tpu.models import SimpleAutoencoder
from lns_tpu.utils.torch_compat import convert_autoencoder, to_jax

from _reference import load_reference, reference_namespace

REF = load_reference()
pytestmark = [pytest.mark.slow, pytest.mark.skipif(REF is None, reason="reference unavailable")]

CFG_DIR = "/root/reference/configs"


def _round_trip(raw, mod_name, shape, atol=3e-4):
    raw = dict(raw)
    raw.setdefault("disable_coarse_attn", None)
    raw.setdefault("use_attn_enc", None)
    torch.manual_seed(0)
    ns = reference_namespace(raw)
    tae = getattr(REF, mod_name).SimpleAutoencoder(ns).eval()
    sd = {k: v.detach().numpy() for k, v in tae.state_dict().items()}

    cfg = Config(raw)
    jae = SimpleAutoencoder(cfg)
    params = to_jax(convert_autoencoder(cfg, sd))

    x = torch.randn(*shape)
    with torch.no_grad():
        yt = tae(x)
    yj = jae.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.array(yj), yt.numpy().transpose(0, 2, 3, 1), atol=atol)


@pytest.fixture(scope="module")
def ns2d_raw():
    return yaml.safe_load(open(f"{CFG_DIR}/ns2d_atage1_ae.yml"))


def test_use_fa_false_sa_decoder(ns2d_raw):
    raw = dict(ns2d_raw, use_fa=False)
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_disable_coarse_attn(ns2d_raw):
    raw = dict(ns2d_raw, disable_coarse_attn=True)
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_final_smoothing_fourier_head(ns2d_raw):
    raw = dict(ns2d_raw, final_smoothing=True)
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_encoder_attention_fa(ns2d_raw):
    raw = dict(ns2d_raw, use_attn_enc=True, attn_resolutions=[64, 16, 32])
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_encoder_attention_sa(ns2d_raw):
    raw = dict(ns2d_raw, use_attn_enc=True, use_fa=False, attn_resolutions=[16, 32])
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_encoder_fourier_levels(ns2d_raw):
    raw = dict(ns2d_raw, fourier_resolutions=[64, 32])
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_nonsquared_fourier_and_smoothing():
    raw = yaml.safe_load(open(f"{CFG_DIR}/twophase_stage1_ae.yml"))
    raw = dict(raw, fourier_resolutions=[61], final_smoothing=True)
    _round_trip(raw, "autoencoder2d_nonsquared", (1, 4, 61, 121))


def test_half_periodic_sa_and_smoothing():
    raw = yaml.safe_load(open(f"{CFG_DIR}/SW_stage1_ae.yml"))
    raw = dict(raw, use_fa=False, final_smoothing=True)
    _round_trip(raw, "autoencoder2d_half_periodic", (1, 3, 96, 192))


def test_half_periodic_disable_coarse():
    raw = yaml.safe_load(open(f"{CFG_DIR}/SW_stage1_ae.yml"))
    raw = dict(raw, disable_coarse_attn=True)
    _round_trip(raw, "autoencoder2d_half_periodic", (1, 3, 96, 192))


def test_multi_res_blocks_periodic(ns2d_raw):
    raw = dict(ns2d_raw, encoder_res_blocks=2, decoder_res_blocks=2)
    _round_trip(raw, "autoencoder2d", (1, 1, 64, 64))


def test_multi_res_blocks_nonsquared():
    raw = yaml.safe_load(open(f"{CFG_DIR}/twophase_stage1_ae.yml"))
    raw = dict(raw, encoder_res_blocks=2, decoder_res_blocks=2)
    _round_trip(raw, "autoencoder2d_nonsquared", (1, 4, 61, 121))


def test_multi_res_blocks_half_periodic():
    raw = yaml.safe_load(open(f"{CFG_DIR}/SW_stage1_ae.yml"))
    raw = dict(raw, encoder_res_blocks=2, decoder_res_blocks=2)
    _round_trip(raw, "autoencoder2d_half_periodic", (1, 3, 96, 192))
