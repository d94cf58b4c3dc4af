"""torch checkpoint -> dawn_tpu flax parameter conversion.

Loads the released DAWN checkpoints (formats per SURVEY.md section 2.7):
- ``DAWN_{128,256}.pth``: {'example', 'diffusion': state_dict, 'optimizer_diff'}
  where 'diffusion' is GaussianDiffusion(denoise_fn=Unet3D) -> keys prefixed
  ``denoise_fn.`` plus schedule buffers (recomputed here, not loaded).
- ``LFG_*.pth``: {'generator', 'bg_predictor', 'region_predictor', ...}.
- PBnet ``checkpoint_*.pth.tar``: bare CAE state_dict + sibling opt.yaml.

Works from either a loaded state_dict-like mapping of numpy arrays or a torch
file path (torch is only imported for file loading, never in the compute path).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp


# ----------------------------------------------------------------- primitives

def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy()  # torch tensor


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def sd_numpy(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    return {k: _np(v) for k, v in sd.items()}


def _linear(sd, name, bias=True):
    p = {"kernel": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _conv2d(sd, name, bias=True):
    w = _np(sd[f"{name}.weight"])              # (O, I, kh, kw)
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if bias and f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _conv3d(sd, name, bias=True):
    w = _np(sd[f"{name}.weight"])              # (O, I, 1, kh, kw)
    assert w.shape[2] == 1, f"{name}: temporal kernel must be 1, got {w.shape}"
    p = {"kernel": jnp.asarray(np.transpose(w[:, :, 0], (2, 3, 1, 0)))}
    if bias and f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _conv_transpose3d_flipped(sd, name):
    """torch ConvTranspose3d (I, O, 1, kh, kw) -> pre-flipped HWIO."""
    w = _np(sd[f"{name}.weight"])[:, :, 0]     # (I, O, kh, kw)
    w = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    return {"kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _bn(sd, name):
    params = {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
              "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}
    stats = {"mean": jnp.asarray(_np(sd[f"{name}.running_mean"])),
             "var": jnp.asarray(_np(sd[f"{name}.running_var"]))}
    return params, stats


def _group_norm(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _chan_ln(sd, key):
    """UNet LayerNorm gamma (1,C,1,1,1) or LayerNorm_img g (C,) -> (C,)."""
    return {"gamma": jnp.asarray(_np(sd[key]).reshape(-1))}


# ---------------------------------------------------------------- UNet3D (DM)

def _cond_cross_attn(sd, pfx):
    return {
        "norm": _chan_ln(sd, f"{pfx}.norm.g"),
        "to_q": _linear(sd, f"{pfx}.to_q", bias=False),
        "to_kv": _linear(sd, f"{pfx}.to_kv", bias=False),
        "to_out": _linear(sd, f"{pfx}.to_out.0", bias=False),
        "out_norm": _chan_ln(sd, f"{pfx}.to_out.1.g"),
        "null_kv": jnp.asarray(_np(sd[f"{pfx}.null_kv"])),
        "q_scale": jnp.asarray(_np(sd[f"{pfx}.q_scale"])),
        "k_scale": jnp.asarray(_np(sd[f"{pfx}.k_scale"])),
    }


def _resnet_ca_mul(sd, pfx):
    p: Dict[str, Any] = {
        "block1": {"proj": _conv3d(sd, f"{pfx}.block1.proj"),
                   "norm": _group_norm(sd, f"{pfx}.block1.norm")},
        "block2": {"proj": _conv3d(sd, f"{pfx}.block2.proj"),
                   "norm": _group_norm(sd, f"{pfx}.block2.norm")},
    }
    if f"{pfx}.time_mlp.1.weight" in sd:
        p["time_mlp"] = _linear(sd, f"{pfx}.time_mlp.1")
        p["audio_mlp"] = _linear(sd, f"{pfx}.audio_mlp.1")
        p["pose_mlp"] = _linear(sd, f"{pfx}.pose_mlp.1")
        p["eye_mlp"] = _linear(sd, f"{pfx}.eye_mlp.1")
        p["cross_attn_aud"] = _cond_cross_attn(sd, f"{pfx}.cross_attn_aud")
        p["cross_attn_pose"] = _cond_cross_attn(sd, f"{pfx}.cross_attn_pose")
        p["cross_attn_eye"] = _cond_cross_attn(sd, f"{pfx}.cross_attn_eye")
    if f"{pfx}.res_conv.weight" in sd:
        p["res_conv"] = _conv3d(sd, f"{pfx}.res_conv")
    return p


def _temporal_attn(sd, pfx):
    """Residual(PreNorm(LayerNorm, EinopsToAndFrom(Attention)))."""
    return {
        "norm": _chan_ln(sd, f"{pfx}.fn.norm.gamma"),
        "attn": {"to_qkv": _linear(sd, f"{pfx}.fn.fn.fn.to_qkv", bias=False),
                 "to_out": _linear(sd, f"{pfx}.fn.fn.fn.to_out", bias=False)},
    }


def _spatial_linear_attn(sd, pfx):
    return {
        "norm": _chan_ln(sd, f"{pfx}.fn.norm.gamma"),
        "attn": {"to_qkv": _conv2d(sd, f"{pfx}.fn.fn.to_qkv", bias=False),
                 "to_out": _conv2d(sd, f"{pfx}.fn.fn.to_out")},
    }


def convert_unet3d(sd: Mapping[str, Any], num_levels: int = 4,
                   prefix: str = "") -> Dict[str, Any]:
    """Unet3D state_dict -> flax params for dawn_tpu.models.dm.Unet3D.

    ``prefix`` is 'denoise_fn.' when converting from a GaussianDiffusion
    state_dict (the DAWN_*.pth layout).
    """
    def k(name):
        return f"{prefix}{name}"

    sd = {key: val for key, val in sd.items()}
    p: Dict[str, Any] = {
        "time_rel_pos_bias": jnp.asarray(
            _np(sd[k("time_rel_pos_bias.relative_attention_bias.weight")])),
        "init_conv": _conv3d(sd, k("init_conv")),
        "init_temporal_attn": _temporal_attn(sd, k("init_temporal_attn")),
        "time_mlp_1": _linear(sd, k("time_mlp.1")),
        "time_mlp_2": _linear(sd, k("time_mlp.3")),
        "mid_block1": _resnet_ca_mul(sd, k("mid_block1")),
        "mid_block2": _resnet_ca_mul(sd, k("mid_block2")),
        "mid_spatial_attn": _temporal_attn(sd, k("mid_spatial_attn")),
        "mid_temporal_attn": _temporal_attn(sd, k("mid_temporal_attn")),
        "final_block": _resnet_ca_mul(sd, k("final_conv.0")),
        "final_conv": _conv3d(sd, k("final_conv.1")),
        "occlusion_block": _resnet_ca_mul(sd, k("occlusion_map.0")),
        "occlusion_conv": _conv3d(sd, k("occlusion_map.1")),
    }
    for i in range(num_levels):
        p[f"down_{i}_block1"] = _resnet_ca_mul(sd, k(f"downs.{i}.0"))
        p[f"down_{i}_block2"] = _resnet_ca_mul(sd, k(f"downs.{i}.1"))
        p[f"down_{i}_spatial"] = _spatial_linear_attn(sd, k(f"downs.{i}.2"))
        p[f"down_{i}_temporal"] = _temporal_attn(sd, k(f"downs.{i}.3"))
        if f"{prefix}downs.{i}.4.weight" in sd:
            p[f"down_{i}_downsample"] = {"conv": _conv3d(sd, k(f"downs.{i}.4"))}
        p[f"up_{i}_block1"] = _resnet_ca_mul(sd, k(f"ups.{i}.0"))
        p[f"up_{i}_block2"] = _resnet_ca_mul(sd, k(f"ups.{i}.1"))
        p[f"up_{i}_spatial"] = _spatial_linear_attn(sd, k(f"ups.{i}.2"))
        p[f"up_{i}_temporal"] = _temporal_attn(sd, k(f"ups.{i}.3"))
        if f"{prefix}ups.{i}.4.weight" in sd:
            p[f"up_{i}_upsample"] = _conv_transpose3d_flipped(sd, k(f"ups.{i}.4"))
    return {"params": p}


def convert_dawn_checkpoint(path: str, num_levels: int = 4) -> Dict[str, Any]:
    """DAWN_*.pth -> Unet3D flax params (checkpoint['diffusion'] layout)."""
    ckpt = load_torch_file(path)
    return convert_unet3d(sd_numpy(ckpt["diffusion"]), num_levels,
                          prefix="denoise_fn.")


# --------------------------------------------------------------------- LFG

def _lfg_block(sd, pfx):
    """SameBlock2d / DownBlock2d / UpBlock2d param+stats pair."""
    bn_p, bn_s = _bn(sd, f"{pfx}.norm")
    return ({"conv": _conv2d(sd, f"{pfx}.conv"), "norm": bn_p},
            {"norm": bn_s})


def _lfg_resblock(sd, pfx):
    n1p, n1s = _bn(sd, f"{pfx}.norm1")
    n2p, n2s = _bn(sd, f"{pfx}.norm2")
    return ({"conv1": _conv2d(sd, f"{pfx}.conv1"),
             "conv2": _conv2d(sd, f"{pfx}.conv2"),
             "norm1": n1p, "norm2": n2p},
            {"norm1": n1s, "norm2": n2s})


def _hourglass(sd, pfx, num_blocks):
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    stats: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    for i in range(num_blocks):
        p, s = _lfg_block(sd, f"{pfx}.encoder.down_blocks.{i}")
        params["encoder"][f"down_{i}"] = p
        stats["encoder"][f"down_{i}"] = s
        p, s = _lfg_block(sd, f"{pfx}.decoder.up_blocks.{i}")
        params["decoder"][f"up_{i}"] = p
        stats["decoder"][f"up_{i}"] = s
    return params, stats


def convert_lfg_generator(sd: Mapping[str, Any], num_down_blocks: int = 2,
                          num_bottleneck: int = 6,
                          flow_predictor_blocks: int = 5) -> Dict[str, Any]:
    """Generator state_dict -> {params, batch_stats} for LFGGenerator (+flow predictor)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _lfg_block(sd, "first")
    params["first"], stats["first"] = p, s
    for i in range(num_down_blocks):
        p, s = _lfg_block(sd, f"down_blocks.{i}")
        params[f"down_blocks_{i}"], stats[f"down_blocks_{i}"] = p, s
        p, s = _lfg_block(sd, f"up_blocks.{i}")
        params[f"up_blocks_{i}"], stats[f"up_blocks_{i}"] = p, s
    for i in range(num_bottleneck):
        p, s = _lfg_resblock(sd, f"bottleneck.r{i}")
        params[f"bottleneck_{i}"], stats[f"bottleneck_{i}"] = p, s
    params["final"] = _conv2d(sd, "final")

    out = {"generator": {"params": params, "batch_stats": stats}}

    if any(key.startswith("pixelwise_flow_predictor.") for key in sd):
        fp_params: Dict[str, Any] = {}
        fp_stats: Dict[str, Any] = {}
        hp, hs = _hourglass(sd, "pixelwise_flow_predictor.hourglass",
                            flow_predictor_blocks)
        fp_params["hourglass"], fp_stats["hourglass"] = hp, hs
        fp_params["mask"] = _conv2d(sd, "pixelwise_flow_predictor.mask")
        if "pixelwise_flow_predictor.occlusion.weight" in sd:
            fp_params["occlusion"] = _conv2d(sd, "pixelwise_flow_predictor.occlusion")
        out["pixelwise_flow_predictor"] = {"params": fp_params,
                                           "batch_stats": fp_stats}
    return out


def convert_region_predictor(sd: Mapping[str, Any],
                             num_blocks: int = 5) -> Dict[str, Any]:
    hp, hs = _hourglass(sd, "predictor", num_blocks)
    params = {"predictor": hp, "regions": _conv2d(sd, "regions")}
    stats = {"predictor": hs}
    if "jacobian.weight" in sd:
        params["jacobian"] = _conv2d(sd, "jacobian")
    return {"params": params, "batch_stats": stats}


def convert_bg_predictor(sd: Mapping[str, Any],
                         num_blocks: int = 5) -> Dict[str, Any]:
    params: Dict[str, Any] = {"encoder": {}}
    stats: Dict[str, Any] = {"encoder": {}}
    for i in range(num_blocks):
        p, s = _lfg_block(sd, f"encoder.down_blocks.{i}")
        params["encoder"][f"down_{i}"] = p
        stats["encoder"][f"down_{i}"] = s
    params["fc"] = _linear(sd, "fc")
    return {"params": params, "batch_stats": stats}


def convert_lfg_checkpoint(path: str, **kw) -> Dict[str, Any]:
    """LFG_*.pth -> {generator, pixelwise_flow_predictor, region_predictor,
    bg_predictor} variable trees."""
    ckpt = load_torch_file(path)
    out = convert_lfg_generator(sd_numpy(ckpt["generator"]), **kw)
    out["region_predictor"] = convert_region_predictor(sd_numpy(ckpt["region_predictor"]))
    out["bg_predictor"] = convert_bg_predictor(sd_numpy(ckpt["bg_predictor"]))
    return out


# --------------------------------------------------------------------- PBnet

def _torch_ln(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _rotary_attn(sd, pfx):
    return {"to_qkv": _linear(sd, f"{pfx}.to_qkv", bias=False),
            "to_out": _linear(sd, f"{pfx}.to_out", bias=False)}


def convert_pbnet(sd: Mapping[str, Any], num_layers: int = 2) -> Dict[str, Any]:
    """PBnet CVAE state_dict (encoder.* / decoder.*) -> CVAE variables.

    Layout follows transformerreemb6.py + transformerdecoder5.py module names;
    the unused sinusoidal 'pe' buffers are recomputed, not loaded.
    """
    enc: Dict[str, Any] = {
        "firstposeEmbedding": _linear(sd, "encoder.firstposeEmbedding"),
        "poseEmbedding": _linear(sd, "encoder.poseEmbedding"),
        "audioEmbedding": _linear(sd, "encoder.audioEmbedding"),
        "mu_layer": _linear(sd, "encoder.mu_layer"),
        "sigma_layer": _linear(sd, "encoder.sigma_layer"),
    }
    for i in range(num_layers):
        p = f"encoder.seqTransEncoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "in_proj": {"kernel": jnp.asarray(_np(sd[f"{p}.self_attn.in_proj_weight"]).T),
                        "bias": jnp.asarray(_np(sd[f"{p}.self_attn.in_proj_bias"]))},
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
            "norm1": _torch_ln(sd, f"{p}.norm1"),
            "norm2": _torch_ln(sd, f"{p}.norm2"),
        }

    dec: Dict[str, Any] = {
        "firstposeEmbedding": _linear(sd, "decoder.firstposeEmbedding"),
        "audioEmbedding": _linear(sd, "decoder.audioEmbedding"),
        "ztimelinear": _linear(sd, "decoder.ztimelinear"),
        "init_proj": _linear(sd, "decoder.init_proj"),
        "finallayer": _linear(sd, "decoder.finallayer"),
        "time_rel_pos_bias_tgt": {"relative_attention_bias": jnp.asarray(
            _np(sd["decoder.time_rel_pos_bias_tgt.relative_attention_bias.weight"]))},
        "time_rel_pos_bias_mem": {"relative_attention_bias": jnp.asarray(
            _np(sd["decoder.time_rel_pos_bias_mem.relative_attention_bias.weight"]))},
        "init_attn_norm_gamma": jnp.asarray(
            _np(sd["decoder.init_temporal_attn.fn.norm.gamma"]).reshape(-1)),
        "init_temporal_attn": _rotary_attn(sd, "decoder.init_temporal_attn.fn.fn"),
    }
    for i in range(num_layers):
        p = f"decoder.seqTransDecoder.decoder_layers.{i}"
        dec[f"decoder_layers_{i}"] = {
            "self_attn": _rotary_attn(sd, f"{p}.self_attn"),
            "multihead_attn": {
                "to_q": _linear(sd, f"{p}.multihead_attn.to_q", bias=False),
                "to_k": _linear(sd, f"{p}.multihead_attn.to_k", bias=False),
                "to_v": _linear(sd, f"{p}.multihead_attn.to_v", bias=False),
                "to_out": _linear(sd, f"{p}.multihead_attn.to_out", bias=False),
            },
            "ffn_linear1": _linear(sd, f"{p}.ffn.linear1"),
            "ffn_linear2": _linear(sd, f"{p}.ffn.linear2"),
            "layer_norm1": _torch_ln(sd, f"{p}.layer_norm1"),
            "layer_norm2": _torch_ln(sd, f"{p}.layer_norm2"),
            "layer_norm3": _torch_ln(sd, f"{p}.layer_norm3"),
        }
    return {"encoder": {"params": enc}, "decoder": {"params": dec}}


def convert_pbnet_checkpoint(path: str, num_layers: int = 2) -> Dict[str, Any]:
    """PBnet checkpoint_*.pth.tar (bare state_dict) -> CVAE variables."""
    return convert_pbnet(sd_numpy(load_torch_file(path)), num_layers)
