"""Config loader tests: the 7 reference YAMLs must load unchanged."""

import glob
import os

import pytest

from lns_tpu.config import Config, load_config

REF_CONFIGS = "/root/reference/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference configs unavailable"
)


def test_all_reference_configs_load():
    files = sorted(glob.glob(os.path.join(REF_CONFIGS, "*.yml")))
    assert len(files) == 7
    for f in files:
        cfg = load_config(f)
        assert cfg.latent_dim is not None
        assert cfg.batch_size is not None


def test_missing_keys_default_none():
    cfg = load_config(os.path.join(REF_CONFIGS, "twophase_stage1_ae.yml"))
    # absent from this yml but read by the nonsquared decoder (SURVEY 2.10-2)
    assert cfg.disable_coarse_attn is None
    assert cfg.no_such_key is None


def test_variant_detection():
    assert load_config(os.path.join(REF_CONFIGS, "ns2d_atage1_ae.yml")).ae_variant == "periodic"
    assert load_config(os.path.join(REF_CONFIGS, "SW_stage1_ae.yml")).ae_variant == "half_periodic"
    assert load_config(os.path.join(REF_CONFIGS, "twophase_stage1_ae.yml")).ae_variant == "nonsquared"
    cond = load_config(os.path.join(REF_CONFIGS, "twophase_stage2_cond_prop.yml"))
    assert cond.is_conditional and cond.workload == "twophase_conditional"
    assert not load_config(os.path.join(REF_CONFIGS, "twophase_stage2_prop.yml")).is_conditional


def test_scientific_notation_floats():
    cfg = load_config(os.path.join(REF_CONFIGS, "ns2d_atage1_ae.yml"))
    assert isinstance(cfg.learning_rate, float)
    assert abs(cfg.learning_rate - 3e-5) < 1e-12


def test_config_replace_and_dict():
    c = Config({"a": 1, "b": {"c": 2}})
    d = c.replace(a=5)
    assert d.a == 5 and c.a == 1
    assert c.b.c == 2
    assert c.to_dict() == {"a": 1, "b": {"c": 2}}
