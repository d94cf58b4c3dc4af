"""HF torch HubertModel -> dawn_tpu flax HubertModel weight conversion."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp

from dawn_tpu.models.hubert.model import HubertConfig
from dawn_tpu.weights.torch_convert import _np, _linear


def _conv1d(sd, name, bias=True):
    w = _np(sd[f"{name}.weight"])               # (O, I/g, k)
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0)))}
    if bias and f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _pos_conv(sd, name):
    """Resolve the weight-normed pos conv (weight_g/weight_v or the newer
    parametrizations.weight.original0/1 layout) to an effective kernel."""
    if f"{name}.weight_v" in sd:
        g = _np(sd[f"{name}.weight_g"])
        v = _np(sd[f"{name}.weight_v"])
    elif f"{name}.parametrizations.weight.original1" in sd:
        g = _np(sd[f"{name}.parametrizations.weight.original0"])
        v = _np(sd[f"{name}.parametrizations.weight.original1"])
    else:
        return _conv1d(sd, name)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / norm                            # (O, I/g, k)
    return {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0))),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def convert_hubert(sd: Mapping[str, Any],
                   config: HubertConfig = HubertConfig.large()) -> Dict[str, Any]:
    """HF HubertModel state_dict -> flax variables."""
    fe: Dict[str, Any] = {}
    for i in range(len(config.conv_dim)):
        fe[f"conv_{i}"] = _conv1d(sd, f"feature_extractor.conv_layers.{i}.conv")
        if config.feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
        elif i == 0:
            fe["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")

    p: Dict[str, Any] = {
        "feature_extractor": fe,
        "fp_layer_norm": _ln(sd, "feature_projection.layer_norm"),
        "fp_projection": _linear(sd, "feature_projection.projection"),
        "pos_conv_embed": {"conv": _pos_conv(sd, "encoder.pos_conv_embed.conv")},
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(config.num_hidden_layers):
        lp = f"encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "q_proj": _linear(sd, f"{lp}.attention.q_proj"),
            "k_proj": _linear(sd, f"{lp}.attention.k_proj"),
            "v_proj": _linear(sd, f"{lp}.attention.v_proj"),
            "out_proj": _linear(sd, f"{lp}.attention.out_proj"),
            "layer_norm": _ln(sd, f"{lp}.layer_norm"),
            "intermediate_dense": _linear(sd, f"{lp}.feed_forward.intermediate_dense"),
            "output_dense": _linear(sd, f"{lp}.feed_forward.output_dense"),
            "final_layer_norm": _ln(sd, f"{lp}.final_layer_norm"),
        }
    return {"params": p}


def convert_hubert_pretrained(model_dir: str) -> Tuple[Dict[str, Any], "HubertConfig"]:
    """Load an HF hubert checkpoint directory via transformers (torch),
    convert, and return (variables, config). Requires the local model dir
    (e.g. hubert-large-ls960-ft)."""
    from transformers import HubertModel as TorchHubert
    tm = TorchHubert.from_pretrained(model_dir)
    cfg = HubertConfig(
        hidden_size=tm.config.hidden_size,
        num_hidden_layers=tm.config.num_hidden_layers,
        num_attention_heads=tm.config.num_attention_heads,
        intermediate_size=tm.config.intermediate_size,
        conv_dim=tuple(tm.config.conv_dim),
        conv_kernel=tuple(tm.config.conv_kernel),
        conv_stride=tuple(tm.config.conv_stride),
        conv_bias=tm.config.conv_bias,
        feat_extract_norm=tm.config.feat_extract_norm,
        do_stable_layer_norm=tm.config.do_stable_layer_norm,
        num_conv_pos_embeddings=tm.config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=tm.config.num_conv_pos_embedding_groups,
    )
    return convert_hubert(dict(tm.state_dict()), cfg), cfg
