"""PyTorch -> JAX checkpoint converter.

Imports the reference's `.pt` state dicts (stage-1 `vqgan_epoch_*.pt` AE
checkpoints and stage-2 `model_*.pt` LatentDynamics checkpoints —
checkpoint layout per SURVEY.md section 5) into this framework's param
trees, with strict accounting: every torch key must be consumed and every
flax leaf produced, or conversion fails loudly (mirroring the reference's
strict state-dict loads, modules/autoencoder2d.py:184-186).

Layout transforms:
  * Conv2d  OIHW  -> HWIO (and [O,I,1,1] -> [I,O] for pointwise convs)
  * Linear  [O,I] -> [I,O]
  * GroupNorm/LayerNorm weight/bias -> scale/bias
  * spectral weights [i,o,m...,2] pass through unchanged
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Set

import numpy as np

from lns_tpu.models.specs import LayerSpec, decoder_spec, encoder_spec


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


class _Reader:
    """State-dict view with consumed-key accounting."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.consumed: Set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"torch checkpoint missing key {key!r}")
        self.consumed.add(key)
        return np.asarray(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def assert_consumed(self, prefix: str = ""):
        left = [k for k in self.sd if k.startswith(prefix) and k not in self.consumed]
        if left:
            raise ValueError(f"unconsumed torch keys under {prefix!r}: {left[:10]}"
                             f"{' ...' if len(left) > 10 else ''}")


def _conv(r: _Reader, prefix: str, pointwise: Optional[bool] = None, bias: bool = True):
    w = r.take(prefix + ".weight")
    if pointwise is None:
        pointwise = w.ndim == 4 and w.shape[2] == 1 and w.shape[3] == 1
    if pointwise:
        out = {"kernel": w[:, :, 0, 0].T}  # [O,I,1,1] -> [I,O]
    else:
        out = {"kernel": np.transpose(w, (2, 3, 1, 0))}  # OIHW -> HWIO
    if bias:
        out["bias"] = r.take(prefix + ".bias")
    return out


def _linear(r: _Reader, prefix: str, bias: bool = True):
    out = {"kernel": r.take(prefix + ".weight").T}
    if bias:
        out["bias"] = r.take(prefix + ".bias")
    return out


def _norm(r: _Reader, prefix: str):
    return {"scale": r.take(prefix + ".weight"), "bias": r.take(prefix + ".bias")}


def _resblock(r: _Reader, p: str, has_channel_up: bool):
    out = {
        "gn1": _norm(r, f"{p}.block.0.gn"),
        "conv1": _conv(r, f"{p}.block.2"),
        "gn2": _norm(r, f"{p}.block.3.gn"),
        "conv2": _conv(r, f"{p}.block.5"),
    }
    if has_channel_up:
        out["channel_up"] = _conv(r, f"{p}.channel_up", pointwise=True)
    return out


def _hp_conv(r: _Reader, p: str, bias: bool = True):
    return {"conv": _conv(r, p, pointwise=False, bias=bias)}


def _hp_resblock(r: _Reader, p: str, has_channel_up: bool):
    out = {
        "gn1": _norm(r, f"{p}.norm_act1.norm_act.0.gn"),
        "conv1": _hp_conv(r, f"{p}.conv1"),
        "gn2": _norm(r, f"{p}.norm_act2.norm_act.0.gn"),
        "conv2": _hp_conv(r, f"{p}.conv2"),
    }
    if has_channel_up:
        out["channel_up"] = _conv(r, f"{p}.channel_up", pointwise=True)
    return out


def _sablock(r: _Reader, p: str, use_pe: bool):
    out = {
        "ln": _norm(r, f"{p}.ln"),
        "to_q": _linear(r, f"{p}.to_q", bias=False),
        "to_k": _linear(r, f"{p}.to_k", bias=False),
        "to_v": _linear(r, f"{p}.to_v"),
        "proj_out": _linear(r, f"{p}.proj_out"),
    }
    if use_pe:
        out["pe"] = r.take(f"{p}.pe")
    return out


def _pooling_reducer(r: _Reader, p: str):
    return {
        "to_in": _linear(r, f"{p}.to_in", bias=False),
        "ffn_ln": _norm(r, f"{p}.out_ffn.0"),
        "ffn_fc1": _linear(r, f"{p}.out_ffn.1", bias=False),
        "ffn_fc2": _linear(r, f"{p}.out_ffn.3"),
    }


def _lowrank(r: _Reader, p: str):
    # RotaryEmbedding registers a deterministic `inv_freq` buffer in the torch
    # state dict; it is recomputed from `dim` here, so consume & discard.
    if r.has(f"{p}.pos_emb.inv_freq"):
        r.take(f"{p}.pos_emb.inv_freq")
    return {"to_qk": _linear(r, f"{p}.to_qk", bias=False)}


def _fablock(r: _Reader, p: str):
    return {
        "in_norm": _norm(r, f"{p}.in_norm"),
        "in_proj": _conv(r, f"{p}.in_proj", pointwise=True, bias=False),
        "to_in": _conv(r, f"{p}.to_in.0", pointwise=True, bias=False),
        "to_x": _pooling_reducer(r, f"{p}.to_x.0"),
        "to_y": _pooling_reducer(r, f"{p}.to_y.1"),
        "low_rank_kernel_x": _lowrank(r, f"{p}.low_rank_kernel_x"),
        "low_rank_kernel_y": _lowrank(r, f"{p}.low_rank_kernel_y"),
        "out_fc1": _conv(r, f"{p}.to_out.1", pointwise=True, bias=False),
        "out_fc2": _conv(r, f"{p}.to_out.3", pointwise=True, bias=False),
    }


def _fourier(r: _Reader, p: str, ndim: int):
    if ndim == 1:
        f = {"weights": r.take(f"{p}.fourier.weights")}
    elif ndim == 2:
        f = {
            "weights1": r.take(f"{p}.fourier.weights1"),
            "weights2": r.take(f"{p}.fourier.weights2"),
        }
    else:
        f = {f"weights{i+1}": r.take(f"{p}.fourier.weights{i+1}") for i in range(4)}
    return {"fourier": f, "conv": _conv(r, f"{p}.conv", pointwise=True)}


def convert_layer(spec: LayerSpec, r: _Reader, prefix: str):
    kw = spec.kw
    p = f"{prefix}.{spec.idx}"
    kind = spec.kind
    if kind == "conv":
        return _conv(r, p)
    if kind == "hp_conv":
        return _hp_conv(r, p)
    if kind == "gn":
        return _norm(r, f"{p}.gn") if kw.get("wrapper") else _norm(r, p)
    if kind == "resblock":
        return _resblock(r, p, kw["in_channels"] != kw["out_channels"])
    if kind == "hp_resblock":
        return _hp_resblock(r, p, kw["in_channels"] != kw["out_channels"])
    if kind in ("down", "up"):
        return {"conv": _conv(r, f"{p}.conv_layer")}
    if kind in ("hp_down", "hp_up"):
        return {"conv": _hp_conv(r, f"{p}.conv_layer")}
    if kind == "sablock":
        return _sablock(r, p, kw["use_pe"])
    if kind == "fablock":
        return _fablock(r, p)
    if kind == "fourier":
        return _fourier(r, p, len(kw["modes"]))
    raise ValueError(f"no converter for kind {kind}")


def _seq_params(specs, r, prefix):
    """SpecSequential exposes layers as `m{torch_idx}` submodules."""
    out = {}
    for spec in specs:
        if spec.kind in ("swish", "resize"):
            continue
        out[spec.name] = convert_layer(spec, r, prefix)
    return out


def convert_autoencoder(cfg, sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Convert a stage-1 AE state dict (vqgan_epoch_*.pt) to flax params."""
    r = _Reader(sd)
    pre = prefix + "." if prefix and not prefix.endswith(".") else prefix
    params = {
        "encoder": _seq_params(encoder_spec(cfg), r, f"{pre}encoder.model"),
        "decoder": _seq_params(decoder_spec(cfg), r, f"{pre}decoder.model"),
        "quant_conv": _conv(r, f"{pre}quant_conv", pointwise=True),
        "post_quant_conv": _conv(r, f"{pre}post_quant_conv", pointwise=True),
    }
    r.assert_consumed(pre)
    return params


def convert_propagator(cfg, sd: Dict[str, np.ndarray], prefix: str = "propagator") -> Dict[str, Any]:
    """Convert a SimpleCNN / conditional SimpleCNN propagator subtree."""
    r = _Reader(sd)
    pre = prefix + "." if prefix else ""
    hp = cfg.workload == "sw"

    def conv3(p):
        return _hp_conv(r, p) if hp else _conv(r, p)

    out: Dict[str, Any] = {"in_proj": _conv(r, f"{pre}in_proj", pointwise=True)}
    if cfg.is_conditional:
        out["cond_proj_fc1"] = _linear(r, f"{pre}cond_emb_proj.0")
        out["cond_proj_fc2"] = _linear(r, f"{pre}cond_emb_proj.2")
        for i in range(cfg.prop_n_block):
            b = f"{pre}net.{i}"
            out[f"net{i}"] = {
                "cond_emb": _linear(r, f"{b}.cond_emb"),
                "conv1_gn": _norm(r, f"{b}.conv1.0"),
                "conv1_a": _conv(r, f"{b}.conv1.1"),
                "conv1_b": _conv(r, f"{b}.conv1.3"),
                "cond_conv1_gn": _norm(r, f"{b}.cond_conv1.0"),
                "cond_conv1": _conv(r, f"{b}.cond_conv1.2"),
                "cond_conv2_gn": _norm(r, f"{b}.cond_conv2.0"),
                "cond_conv2_fc1": _conv(r, f"{b}.cond_conv2.1", pointwise=True),
                "cond_conv2_fc2": _conv(r, f"{b}.cond_conv2.3", pointwise=True),
                "ffn_gn": _norm(r, f"{b}.ffn.0"),
                "ffn_fc1": _conv(r, f"{b}.ffn.1", pointwise=True, bias=False),
                "ffn_fc2": _conv(r, f"{b}.ffn.3", pointwise=True, bias=False),
            }
    else:
        for i in range(cfg.prop_n_block):
            b = f"{pre}net.{i}"
            out[f"net{i}"] = {
                "conv_gn": _norm(r, f"{b}.conv.0"),
                "conv1": conv3(f"{b}.conv.1"),
                "conv2": conv3(f"{b}.conv.3"),
                "conv3": conv3(f"{b}.conv.5"),
                "ffn_gn": _norm(r, f"{b}.ffn.0"),
                "ffn_fc1": _conv(r, f"{b}.ffn.1", pointwise=True, bias=False),
                "ffn_fc2": _conv(r, f"{b}.ffn.3", pointwise=True, bias=False),
            }
    out["out_gn"] = _norm(r, f"{pre}out_proj.0.gn")
    out["out_proj"] = _conv(r, f"{pre}out_proj.1", pointwise=True)
    r.assert_consumed(pre)
    return out


def convert_latent_dynamics(cfg, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a stage-2 model_*.pt (frozen AE + propagator). The conditional
    trainer names the AE attribute `ae` instead of `vq_ae`
    (train_stage2_twophase_conditional.py:128)."""
    ae_attr = "ae" if cfg.is_conditional and any(k.startswith("ae.") for k in sd) else "vq_ae"
    ae_sd = {k: v for k, v in sd.items() if k.startswith(ae_attr + ".")}
    prop_sd = {k: v for k, v in sd.items() if k.startswith("propagator.")}
    return {
        "vq_ae": convert_autoencoder(cfg, ae_sd, prefix=ae_attr),
        "propagator": convert_propagator(cfg, prop_sd, prefix="propagator"),
    }


def convert_cond_encoder(cfg, sd: Dict[str, np.ndarray], prefix: str = "encoder") -> Dict[str, Any]:
    """Convert the (dead-in-reference) CondEncoder
    (modules/autoencoder2d_nonsquared.py:71-145)."""
    r = _Reader(sd)
    pre = prefix + "." if prefix else ""
    channels = list(cfg.encoder_channels)
    n_levels = len(channels) - 1
    out: Dict[str, Any] = {
        "to_in_conv1": _conv(r, f"{pre}to_in.0", pointwise=True),
        "to_in_conv2": _conv(r, f"{pre}to_in.2"),
        "embed_fc1": _linear(r, f"{pre}embed.0"),
        "embed_fc2": _linear(r, f"{pre}embed.2"),
    }

    def cond_res(p, in_ch, out_ch):
        d = {
            "conv1": _conv(r, f"{p}.conv1"),
            "conv2": _conv(r, f"{p}.conv2"),
            "norm1": _norm(r, f"{p}.norm1"),
            "norm2": _norm(r, f"{p}.norm2"),
            "cond_emb": _linear(r, f"{p}.cond_emb"),
        }
        if in_ch != out_ch:
            d["shortcut"] = _conv(r, f"{p}.shortcut", pointwise=True)
        return d

    for i in range(n_levels):
        in_ch, out_ch = channels[i], channels[i + 1]
        for j in range(cfg.encoder_res_blocks):
            out[f"level{i}_res{j}"] = cond_res(f"{pre}layers.{i}.0.{j}", in_ch, out_ch)
            in_ch = out_ch
        if i != n_levels - 1:
            out[f"level{i}_down"] = {"conv": _conv(r, f"{pre}layers.{i}.1.conv_layer")}
    out["to_out_conv"] = cond_res(f"{pre}to_out_conv", channels[-1], channels[-1])
    out["to_out_gn"] = _norm(r, f"{pre}to_out.0.gn")
    out["to_out_proj"] = _conv(r, f"{pre}to_out.2", pointwise=True)
    r.assert_consumed(pre)
    return out


def to_jax(params):
    """numpy tree -> jnp tree."""
    import jax.numpy as jnp
    import jax

    return jax.tree.map(jnp.asarray, params)
