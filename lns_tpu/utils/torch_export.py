"""JAX -> PyTorch checkpoint export (inverse of torch_compat).

Lets models trained in this framework be loaded by the reference's strict
`load_state_dict` (modules/autoencoder2d.py:184-186): produces state dicts
with the exact reference key names and OIHW/[O,I] layouts. Driven by the
same layer-spec IR as the importer, so coverage is structural.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from lns_tpu.models.specs import LayerSpec, decoder_spec, encoder_spec


def _conv_w(kernel: np.ndarray, pointwise: bool) -> np.ndarray:
    kernel = np.asarray(kernel)
    if pointwise:  # [I, O] -> [O, I, 1, 1]
        return kernel.T[:, :, None, None]
    return np.transpose(kernel, (3, 2, 0, 1))  # HWIO -> OIHW


def _put_conv(out, prefix, p, pointwise=None, bias=True):
    k = np.asarray(p["kernel"])
    if pointwise is None:
        pointwise = k.ndim == 2
    out[prefix + ".weight"] = _conv_w(k, pointwise)
    if bias:
        out[prefix + ".bias"] = np.asarray(p["bias"])


def _put_linear(out, prefix, p, bias=True):
    out[prefix + ".weight"] = np.asarray(p["kernel"]).T
    if bias:
        out[prefix + ".bias"] = np.asarray(p["bias"])


def _put_norm(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _put_resblock(out, p, pf, has_cu):
    _put_norm(out, f"{pf}.block.0.gn", p["gn1"])
    _put_conv(out, f"{pf}.block.2", p["conv1"])
    _put_norm(out, f"{pf}.block.3.gn", p["gn2"])
    _put_conv(out, f"{pf}.block.5", p["conv2"])
    if has_cu:
        _put_conv(out, f"{pf}.channel_up", p["channel_up"], pointwise=True)


def _put_hp_resblock(out, p, pf, has_cu):
    _put_norm(out, f"{pf}.norm_act1.norm_act.0.gn", p["gn1"])
    _put_conv(out, f"{pf}.conv1", p["conv1"]["conv"], pointwise=False)
    _put_norm(out, f"{pf}.norm_act2.norm_act.0.gn", p["gn2"])
    _put_conv(out, f"{pf}.conv2", p["conv2"]["conv"], pointwise=False)
    if has_cu:
        _put_conv(out, f"{pf}.channel_up", p["channel_up"], pointwise=True)


def _put_sablock(out, p, pf, use_pe):
    _put_norm(out, f"{pf}.ln", p["ln"])
    _put_linear(out, f"{pf}.to_q", p["to_q"], bias=False)
    _put_linear(out, f"{pf}.to_k", p["to_k"], bias=False)
    _put_linear(out, f"{pf}.to_v", p["to_v"])
    _put_linear(out, f"{pf}.proj_out", p["proj_out"])
    if use_pe:
        out[f"{pf}.pe"] = np.asarray(p["pe"])


def _put_pooling(out, p, pf):
    _put_linear(out, f"{pf}.to_in", p["to_in"], bias=False)
    _put_norm(out, f"{pf}.out_ffn.0", p["ffn_ln"])
    _put_linear(out, f"{pf}.out_ffn.1", p["ffn_fc1"], bias=False)
    _put_linear(out, f"{pf}.out_ffn.3", p["ffn_fc2"])


def _put_fablock(out, p, pf):
    _put_norm(out, f"{pf}.in_norm", p["in_norm"])
    _put_conv(out, f"{pf}.in_proj", p["in_proj"], pointwise=True, bias=False)
    _put_conv(out, f"{pf}.to_in.0", p["to_in"], pointwise=True, bias=False)
    _put_pooling(out, p["to_x"], f"{pf}.to_x.0")
    _put_pooling(out, p["to_y"], f"{pf}.to_y.1")
    _put_linear(out, f"{pf}.low_rank_kernel_x.to_qk", p["low_rank_kernel_x"]["to_qk"], bias=False)
    _put_linear(out, f"{pf}.low_rank_kernel_y.to_qk", p["low_rank_kernel_y"]["to_qk"], bias=False)
    # inv_freq buffers are deterministic; reconstruct for strict loads
    kd = np.asarray(p["low_rank_kernel_x"]["to_qk"]["kernel"]).shape[1] // 2
    # dim_head = kd / heads is not recoverable here; the reference registers
    # inv_freq with dim = LowRankKernel dim_head — derived by the caller via
    # spec kwargs (see export_sequential).
    _put_conv(out, f"{pf}.to_out.1", p["out_fc1"], pointwise=True, bias=False)
    _put_conv(out, f"{pf}.to_out.3", p["out_fc2"], pointwise=True, bias=False)


def _put_fourier(out, p, pf, ndim):
    if ndim == 1:
        out[f"{pf}.fourier.weights"] = np.asarray(p["fourier"]["weights"])
    elif ndim == 2:
        out[f"{pf}.fourier.weights1"] = np.asarray(p["fourier"]["weights1"])
        out[f"{pf}.fourier.weights2"] = np.asarray(p["fourier"]["weights2"])
    else:
        for i in range(4):
            out[f"{pf}.fourier.weights{i+1}"] = np.asarray(p["fourier"][f"weights{i+1}"])
    _put_conv(out, f"{pf}.conv", p["conv"], pointwise=True)


def _rotary_inv_freq(dim: int) -> np.ndarray:
    return 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))


def export_sequential(specs, params, prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for spec in specs:
        if spec.kind in ("swish", "resize"):
            continue
        p = params[spec.name]
        pf = f"{prefix}.{spec.idx}"
        kw = spec.kw
        if spec.kind == "conv":
            _put_conv(out, pf, p)
        elif spec.kind == "hp_conv":
            _put_conv(out, pf, p["conv"], pointwise=False)
        elif spec.kind == "gn":
            _put_norm(out, pf + (".gn" if kw.get("wrapper") else ""), p)
        elif spec.kind == "resblock":
            _put_resblock(out, p, pf, kw["in_channels"] != kw["out_channels"])
        elif spec.kind == "hp_resblock":
            _put_hp_resblock(out, p, pf, kw["in_channels"] != kw["out_channels"])
        elif spec.kind in ("down", "up"):
            _put_conv(out, f"{pf}.conv_layer", p["conv"])
        elif spec.kind in ("hp_down", "hp_up"):
            _put_conv(out, f"{pf}.conv_layer", p["conv"]["conv"], pointwise=False)
        elif spec.kind == "sablock":
            _put_sablock(out, p, pf, kw["use_pe"])
        elif spec.kind == "fablock":
            _put_fablock(out, p, pf)
            kd = kw["dim_head"] * 2  # kernel_multiplier=2 (shipped configs)
            inv = _rotary_inv_freq(kd)
            out[f"{pf}.low_rank_kernel_x.pos_emb.inv_freq"] = inv
            out[f"{pf}.low_rank_kernel_y.pos_emb.inv_freq"] = inv
        elif spec.kind == "fourier":
            _put_fourier(out, p, pf, len(kw["modes"]))
        else:
            raise ValueError(spec.kind)
    return out


def export_autoencoder(cfg, params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax AE params -> reference-format state dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    out.update(export_sequential(encoder_spec(cfg), params["encoder"], "encoder.model"))
    out.update(export_sequential(decoder_spec(cfg), params["decoder"], "decoder.model"))
    _put_conv(out, "quant_conv", params["quant_conv"], pointwise=True)
    _put_conv(out, "post_quant_conv", params["post_quant_conv"], pointwise=True)
    return out


def export_propagator(cfg, params: Dict[str, Any], prefix: str = "propagator") -> Dict[str, np.ndarray]:
    """SimpleCNN / conditional SimpleCNN params -> reference trainer keys."""
    out: Dict[str, np.ndarray] = {}
    pre = prefix + "." if prefix else ""
    hp = cfg.workload == "sw"

    def put3(pf, p):
        _put_conv(out, pf, p["conv"] if hp else p, pointwise=False)

    _put_conv(out, f"{pre}in_proj", params["in_proj"], pointwise=True)
    if cfg.is_conditional:
        _put_linear(out, f"{pre}cond_emb_proj.0", params["cond_proj_fc1"])
        _put_linear(out, f"{pre}cond_emb_proj.2", params["cond_proj_fc2"])
        for i in range(cfg.prop_n_block):
            b = params[f"net{i}"]
            pf = f"{pre}net.{i}"
            _put_linear(out, f"{pf}.cond_emb", b["cond_emb"])
            _put_norm(out, f"{pf}.conv1.0", b["conv1_gn"])
            _put_conv(out, f"{pf}.conv1.1", b["conv1_a"])
            _put_conv(out, f"{pf}.conv1.3", b["conv1_b"])
            _put_norm(out, f"{pf}.cond_conv1.0", b["cond_conv1_gn"])
            _put_conv(out, f"{pf}.cond_conv1.2", b["cond_conv1"])
            _put_norm(out, f"{pf}.cond_conv2.0", b["cond_conv2_gn"])
            _put_conv(out, f"{pf}.cond_conv2.1", b["cond_conv2_fc1"], pointwise=True)
            _put_conv(out, f"{pf}.cond_conv2.3", b["cond_conv2_fc2"], pointwise=True)
            _put_norm(out, f"{pf}.ffn.0", b["ffn_gn"])
            _put_conv(out, f"{pf}.ffn.1", b["ffn_fc1"], pointwise=True, bias=False)
            _put_conv(out, f"{pf}.ffn.3", b["ffn_fc2"], pointwise=True, bias=False)
    else:
        for i in range(cfg.prop_n_block):
            b = params[f"net{i}"]
            pf = f"{pre}net.{i}"
            _put_norm(out, f"{pf}.conv.0", b["conv_gn"])
            put3(f"{pf}.conv.1", b["conv1"])
            put3(f"{pf}.conv.3", b["conv2"])
            put3(f"{pf}.conv.5", b["conv3"])
            _put_norm(out, f"{pf}.ffn.0", b["ffn_gn"])
            _put_conv(out, f"{pf}.ffn.1", b["ffn_fc1"], pointwise=True, bias=False)
            _put_conv(out, f"{pf}.ffn.3", b["ffn_fc2"], pointwise=True, bias=False)
    _put_norm(out, f"{pre}out_proj.0.gn", params["out_gn"])
    _put_conv(out, f"{pre}out_proj.1", params["out_proj"], pointwise=True)
    return out


def export_latent_dynamics(cfg, params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """{vq_ae, propagator} params -> stage-2 model_*.pt state dict."""
    ae_attr = "ae" if cfg.is_conditional else "vq_ae"
    out: Dict[str, np.ndarray] = {}
    ae = export_autoencoder(cfg, params["vq_ae"])
    out.update({f"{ae_attr}.{k}": v for k, v in ae.items()})
    out.update(export_propagator(cfg, params["propagator"]))
    return out


def save_torch_checkpoint(state: Dict[str, np.ndarray], path: str) -> None:
    import torch

    torch.save({k: torch.tensor(np.asarray(v)) for k, v in state.items()}, path)
