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
pytestmark = [pytest.mark.slow, pytest.mark.skipif(REF is None, reason="reference unavailable")]

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


def test_export_latent_dynamics_roundtrip(tmp_path):
    """Stage-2 dynamics export -> reference trainer strict load + parity."""
    from lns_tpu.models import LatentDynamics
    from lns_tpu.utils.torch_export import export_latent_dynamics

    cfg = load_config(f"{CFG_DIR}/ns2d_stage2_prop.yml")
    model = LatentDynamics(cfg)
    params = model.init(jax.random.PRNGKey(0), (1, 64, 64, 1))["params"]
    state = export_latent_dynamics(cfg, params)

    raw = yaml.safe_load(open(f"{CFG_DIR}/ns2d_stage2_prop.yml"))
    raw.setdefault("use_attn_enc", None)
    t = REF.trainers["train_stage2_ns2d"]
    tmodel = t.LatentDynamics(reference_namespace(raw)).eval()
    tmodel.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in state.items()},
                           strict=True)

    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        yt = tmodel.predict(x, 3, to_x=True)
    yj = model.predict({"params": params},
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 3, to_x=True)
    np.testing.assert_allclose(np.array(yj), yt.numpy().transpose(0, 1, 3, 4, 2),
                               atol=3e-4)
