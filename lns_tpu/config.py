"""Config system: reads the reference's flat YAML experiment files unchanged.

The reference parses YAML with ``yaml.safe_load`` into an argparse-style
namespace via a (missing) ``dict2namespace`` helper; several shipped configs
omit keys that the model code reads (e.g. ``disable_coarse_attn`` is absent
from twophase_stage1_ae.yml but read by the nonsquared decoder), so missing
keys must resolve to ``None`` rather than raising
(reference: train_stage1_ns2d.py:158-161, SURVEY.md section 2.10-2).

``Config`` is a thin attribute-access wrapper with that default-None
behavior, plus helpers to detect which workload/variant a config describes.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml


class Config:
    """Attribute-access view over a nested dict; missing keys -> None."""

    def __init__(self, d: Optional[Dict[str, Any]] = None, **kwargs):
        object.__setattr__(self, "_data", {})
        if d:
            for k, v in d.items():
                self._data[k] = Config(v) if isinstance(v, dict) else v
        for k, v in kwargs.items():
            self._data[k] = Config(v) if isinstance(v, dict) else v

    # -- mapping-ish interface -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError(name)
        return self._data.get(name, None)

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = value

    def __getitem__(self, name: str) -> Any:
        return self._data.get(name, None)

    def __setitem__(self, name: str, value: Any) -> None:
        self._data[name] = value

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def get(self, name: str, default: Any = None) -> Any:
        v = self._data.get(name, None)
        return default if v is None else v

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self._data.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def replace(self, **kwargs) -> "Config":
        new = Config(copy.deepcopy(self.to_dict()))
        for k, v in kwargs.items():
            new[k] = v
        return new

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    # -- workload detection ----------------------------------------------------
    @property
    def ae_variant(self) -> str:
        """Which autoencoder topology this config describes.

        Mirrors the reference's per-script module choice:
          * 'half_periodic'  — modules/autoencoder2d_half_periodic.py
            (selected by the presence of ``periodic_direction``; SW configs)
          * 'nonsquared'     — modules/autoencoder2d_nonsquared.py
            (rectangular ``resolutions`` with ``is_periodic`` False; two-phase)
          * 'periodic'       — modules/autoencoder2d.py (square ``resolution``)
        """
        if self.periodic_direction is not None:
            return "half_periodic"
        if self.resolutions is not None:
            return "nonsquared"
        return "periodic"

    @property
    def is_conditional(self) -> bool:
        """Conditional propagator configs carry ``cond_channels``
        (reference: configs/twophase_stage2_cond_prop.yml)."""
        return self.cond_channels is not None

    @property
    def workload(self) -> str:
        if self.ae_variant == "half_periodic":
            return "sw"
        if self.ae_variant == "nonsquared":
            return "twophase_conditional" if self.is_conditional else "twophase"
        return "ns2d"


def load_config(path: str) -> Config:
    """Load a reference-format YAML experiment file."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return Config(raw)


def dict2namespace(d: Dict[str, Any]) -> Config:
    """Compatibility alias for the reference's (missing) helper
    (imported by all 7 reference trainers, e.g. train_stage1_ns2d.py:14)."""
    return Config(d)
