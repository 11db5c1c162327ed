"""Import helper for the upstream PyTorch reference at /root/reference.

Used ONLY by golden tests to execute the reference's behavior for
comparison — the reference ships with two missing modules
(`modules/siren_module.py`, `utils.py`; SURVEY.md section 2.10) and an
undefined `padding_mode` global in the periodic encoder, so importing it
requires shims. Tests that depend on this skip cleanly when the reference
tree is absent.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference():
    """Make the reference's `modules` package importable; returns the
    imported `modules` namespace or None when unavailable."""
    import os

    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "modules")):
        return None
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # Shim the missing modules the reference imports but does not ship.
    if "modules.siren_module" not in sys.modules:
        shim = types.ModuleType("modules.siren_module")
        shim.SirenNet = object
        shim.SirenWrapper = object
        sys.modules["modules.siren_module"] = shim
    if "utils" not in sys.modules:
        shim = types.ModuleType("utils")

        def dict2namespace(d):
            import argparse

            ns = argparse.Namespace()
            for k, v in d.items():
                setattr(ns, k, dict2namespace(v) if isinstance(v, dict) else v)
            return ns

        shim.dict2namespace = dict2namespace
        sys.modules["utils"] = shim

    # Shim heavy/absent deps so the trainer scripts (which define the live
    # stage-2 propagators at module level) are importable for golden tests.
    def _stub_getattr(name):
        # dunders must raise (PEP 562): returning callables for __file__ etc.
        # breaks inspect-based machinery elsewhere (e.g. torch.optim)
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    for missing in ("wandb", "xarray"):
        if missing not in sys.modules:
            try:
                __import__(missing)
            except ImportError:
                import importlib.machinery

                stub = types.ModuleType(missing)
                stub.__getattr__ = _stub_getattr
                # a real ModuleSpec: torch dynamo's trace_rules calls
                # importlib.util.find_spec on loaded module names
                stub.__spec__ = importlib.machinery.ModuleSpec(missing, loader=None)
                sys.modules[missing] = stub

    import modules.basics as basics  # noqa: F401
    import modules.autoencoder2d as ae2d
    import modules.autoencoder2d_half_periodic as ae2d_hp  # noqa: F401
    import modules.autoencoder2d_nonsquared as ae2d_ns  # noqa: F401
    import modules.factorized_attention as fa  # noqa: F401
    import modules.cond_utils as cond_utils  # noqa: F401
    import modules.fourier_cond as fourier_cond  # noqa: F401
    import modules.embedding as embedding  # noqa: F401

    # The published periodic Encoder reads an undefined `padding_mode`
    # (autoencoder2d.py:32 — NameError); the intended value for the NS2d
    # config is 'circular' (is_periodic: True). Injecting a module-level
    # global restores the intended behavior without touching the read-only
    # reference tree.
    if not hasattr(ae2d, "padding_mode"):
        ae2d.padding_mode = "circular"

    import importlib

    trainers = {}
    for t in (
        "train_stage2_ns2d",
        "train_stage2_SW",
        "train_stage2_twophase",
        "train_stage2_twophase_conditional",
    ):
        try:
            trainers[t] = importlib.import_module(t)
        except Exception:
            trainers[t] = None

    ns = types.SimpleNamespace(
        trainers=trainers,
        basics=basics,
        autoencoder2d=ae2d,
        autoencoder2d_half_periodic=ae2d_hp,
        autoencoder2d_nonsquared=ae2d_ns,
        factorized_attention=fa,
        cond_utils=cond_utils,
        fourier_cond=fourier_cond,
        embedding=embedding,
    )
    return ns


def reference_namespace(d: dict):
    """dict -> argparse.Namespace mirroring the reference's config object."""
    import argparse

    ns = argparse.Namespace()
    for k, v in d.items():
        setattr(ns, k, v)
    return ns
