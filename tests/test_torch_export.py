"""Round-trip: our params -> torch .pt -> reference strict load -> parity."""

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from lns_tpu.config import load_config
from lns_tpu.models import SimpleAutoencoder
from lns_tpu.utils.torch_export import export_autoencoder, save_torch_checkpoint

from _reference import load_reference, reference_namespace

REF = load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference unavailable")

CFG_DIR = "/root/reference/configs"


@pytest.mark.parametrize("cfg_name,mod_name,shape", [
    ("ns2d_atage1_ae", "autoencoder2d", (1, 1, 64, 64)),
    ("SW_stage1_ae", "autoencoder2d_half_periodic", (1, 3, 96, 192)),
    ("twophase_stage1_ae", "autoencoder2d_nonsquared", (1, 4, 61, 121)),
])
def test_export_loads_strict_and_matches(cfg_name, mod_name, shape, tmp_path):
    cfg = load_config(f"{CFG_DIR}/{cfg_name}.yml")
    jae = SimpleAutoencoder(cfg)
    v = jae.init(jax.random.PRNGKey(0), jnp.zeros((1, shape[2], shape[3], shape[1])))
    params = v["params"]

    state = export_autoencoder(cfg, params)
    pt_path = str(tmp_path / "export.pt")
    save_torch_checkpoint(state, pt_path)

    raw = yaml.safe_load(open(f"{CFG_DIR}/{cfg_name}.yml"))
    raw.setdefault("disable_coarse_attn", None)
    raw.setdefault("use_attn_enc", None)
    tae = getattr(REF, mod_name).SimpleAutoencoder(reference_namespace(raw)).eval()
    tae.load_state_dict(torch.load(pt_path), strict=True)  # must not raise

    x = torch.randn(*shape)
    with torch.no_grad():
        yt = tae(x)
    yj = jae.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.array(yj), yt.numpy().transpose(0, 2, 3, 1), atol=3e-4)
