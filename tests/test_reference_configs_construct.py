"""Every shipped stage-2 reference config must construct + run its full
model (encode -> propagate -> decode) at the real field shapes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lns_tpu.config import load_config
from lns_tpu.models import LatentDynamics

CFG_DIR = "/root/reference/configs"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(CFG_DIR), reason="reference unavailable")]

CASES = [
    ("ns2d_stage2_prop.yml", (1, 64, 64, 1), (8, 8, 16), False),
    ("SW_stage2_prop.yml", (1, 96, 192, 3), (12, 24, 64), False),
    ("twophase_stage2_prop.yml", (1, 61, 121, 4), (7, 15, 64), False),
    ("twophase_stage2_cond_prop.yml", (1, 61, 121, 4), (7, 15, 64), True),
]


@pytest.mark.parametrize("cfg_name,xshape,zshape,cond", CASES)
def test_stage2_config_full_cycle(cfg_name, xshape, zshape, cond):
    cfg = load_config(os.path.join(CFG_DIR, cfg_name))
    model = LatentDynamics(cfg)
    variables = model.init(jax.random.PRNGKey(0), xshape)
    params = variables["params"]
    x = jnp.zeros(xshape)
    z = model.encode(params, x)
    assert z.shape == (1,) + zshape
    c = jnp.zeros((1,)) if cond else None
    z2 = model.propagate(params, z, c)
    assert z2.shape == z.shape
    y = model.decode(params, z2)
    assert y.shape == xshape
    # 2-step fused rollout executes
    out = model.predict(params, x, 2, cond=c, to_x=True)
    assert out.shape == (1, 2) + xshape[1:]
