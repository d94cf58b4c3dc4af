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
    """Load a torch checkpoint WITHOUT torch (pure zip+pickle reader,
    dawn_tpu.weights.pth_reader) — the TPU image carries no torch; only
    legacy pre-1.6 files fall back to ``torch.load`` inside the reader."""
    from dawn_tpu.weights.pth_reader import load_pth
    return load_pth(path)


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


def convert_face_loc(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Face_loc_Encoder state_dict (..._init_cond_test.py:39-50) ->
    dawn_tpu FaceLocEncoder params (two stride-2 convs)."""
    return {"params": {"conv1": _conv2d(sd, "conv1"),
                       "conv2": _conv2d(sd, "conv2")}}


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


def convert_pbnet_encoder_transformer(sd: Mapping[str, Any], prefix: str = "",
                                      num_layers: int = 2) -> Dict[str, Any]:
    """Encoder_TRANSFORMERREEMB6 / Encoder_TRANSFORMER (identical layouts:
    transformerreemb6.py:146, transformer.py:83) -> EncoderTransformerReemb6
    params."""
    enc: Dict[str, Any] = {
        "firstposeEmbedding": _linear(sd, f"{prefix}firstposeEmbedding"),
        "poseEmbedding": _linear(sd, f"{prefix}poseEmbedding"),
        "audioEmbedding": _linear(sd, f"{prefix}audioEmbedding"),
        "mu_layer": _linear(sd, f"{prefix}mu_layer"),
        "sigma_layer": _linear(sd, f"{prefix}sigma_layer"),
    }
    for i in range(num_layers):
        p = f"{prefix}seqTransEncoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "in_proj": {"kernel": jnp.asarray(_np(sd[f"{p}.self_attn.in_proj_weight"]).T),
                        "bias": jnp.asarray(_np(sd[f"{p}.self_attn.in_proj_bias"]))},
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
            "norm1": _torch_ln(sd, f"{p}.norm1"),
            "norm2": _torch_ln(sd, f"{p}.norm2"),
        }
    return enc


def convert_pbnet(sd: Mapping[str, Any], num_layers: int = 2) -> Dict[str, Any]:
    """PBnet CVAE state_dict (encoder.* / decoder.*) -> CVAE variables.

    Layout follows transformerreemb6.py + transformerdecoder5.py module names;
    the unused sinusoidal 'pe' buffers are recomputed, not loaded.
    """
    enc = convert_pbnet_encoder_transformer(sd, "encoder.", num_layers)

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


# ------------------------------------------------- PBnet ablation archs

def _torch_mha(sd, pfx):
    """torch nn.MultiheadAttention packed layout -> _TorchMHA params."""
    return {"in_proj_weight": jnp.asarray(_np(sd[f"{pfx}.in_proj_weight"])),
            "in_proj_bias": jnp.asarray(_np(sd[f"{pfx}.in_proj_bias"])),
            "out_proj": _linear(sd, f"{pfx}.out_proj")}


def convert_pbnet_decoder_transformer(sd: Mapping[str, Any], prefix: str = "",
                                      num_layers: int = 2) -> Dict[str, Any]:
    """Decoder_TRANSFORMER (transformer.py:170) -> DecoderTransformer params."""
    p = lambda n: f"{prefix}{n}"
    dec: Dict[str, Any] = {
        "firstposeEmbedding": _linear(sd, p("firstposeEmbedding")),
        "audioEmbedding": _linear(sd, p("audioEmbedding")),
        "ztimelinear": _linear(sd, p("ztimelinear")),
        "finallayer": _linear(sd, p("finallayer")),
    }
    for i in range(num_layers):
        q = p(f"seqTransDecoder.layers.{i}")
        dec[f"layers_{i}"] = {
            "self_attn": _torch_mha(sd, f"{q}.self_attn"),
            "multihead_attn": _torch_mha(sd, f"{q}.multihead_attn"),
            "linear1": _linear(sd, f"{q}.linear1"),
            "linear2": _linear(sd, f"{q}.linear2"),
            "norm1": _torch_ln(sd, f"{q}.norm1"),
            "norm2": _torch_ln(sd, f"{q}.norm2"),
            "norm3": _torch_ln(sd, f"{q}.norm3"),
        }
    return dec


def _resunet(sd, pfx):
    """mlp.py ResUnet state_dict -> flax ResUnet (params, batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(name, p, s=None):
        params[name] = p
        if s is not None:
            stats[name] = s

    def res_block(dst, src):
        pp, ss = {}, {}
        for bn_dst, bn_src in (("bn1", "conv_block.0"), ("bn2", "conv_block.3"),
                               ("bn_skip", "conv_skip.1")):
            pp[bn_dst], ss[bn_dst] = _bn(sd, f"{pfx}.{src}.{bn_src}")
        pp["conv1"] = _conv2d(sd, f"{pfx}.{src}.conv_block.2")
        pp["conv2"] = _conv2d(sd, f"{pfx}.{src}.conv_block.5")
        pp["skip_conv"] = _conv2d(sd, f"{pfx}.{src}.conv_skip.0")
        params[dst], stats[dst] = pp, ss

    put("in_conv1", _conv2d(sd, f"{pfx}.input_layer.0"))
    pbn, sbn = _bn(sd, f"{pfx}.input_layer.1")
    put("in_bn", pbn, sbn)
    put("in_conv2", _conv2d(sd, f"{pfx}.input_layer.3"))
    put("in_skip", _conv2d(sd, f"{pfx}.input_skip.0"))
    res_block("res1", "residual_conv_1")
    res_block("res2", "residual_conv_2")
    res_block("bridge", "bridge")
    for i in (1, 2, 3):
        w = _np(sd[f"{pfx}.upsample_{i}.upsample.weight"])    # (I, O, kh, kw)
        # same recipe as _conv_transpose3d_flipped: HWIO + spatial flip makes
        # flax ConvTranspose (transpose_kernel=False) match torch exactly
        wk = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        params[f"up{i}"] = {
            "kernel": jnp.asarray(np.ascontiguousarray(wk)),
            "bias": jnp.asarray(_np(sd[f"{pfx}.upsample_{i}.upsample.bias"]))}
        res_block(f"upres{i}", f"up_residual_conv{i}")
    put("out_conv", _conv2d(sd, f"{pfx}.output_layer.0"))
    return params, stats


def convert_pbnet_mlp(sd: Mapping[str, Any], who: str = "encoder") -> Dict[str, Any]:
    """Encoder_MLP / Decoder_MLP (mlp.py:176,232) -> flax variables
    {'params', 'batch_stats'}. `sd` keys are unprefixed module names."""
    rp, rs = _resunet(sd, "resunet")
    params: Dict[str, Any] = {"resunet": rp,
                              "linear_audio": _linear(sd, "linear_audio"),
                              "mlp_l0": _linear(sd, "MLP.L0")}
    if who == "encoder":
        params["linear_means"] = _linear(sd, "linear_means")
        # linear_logvar exists in the checkpoint but is unused (mlp.py:225)
    else:
        params["mlp_l1"] = _linear(sd, "MLP.L1")
        params["pose_linear"] = _linear(sd, "pose_linear")
    return {"params": params, "batch_stats": {"resunet": rs}}


def convert_pbnet_autotrans(sd: Mapping[str, Any],
                            num_layers: int = 2) -> Dict[str, Any]:
    """Decoder_AUTOTRANS (autotrans.py:60) -> DecoderAutotrans params."""

    def joey_mha(pfx):
        return {"k_layer": _linear(sd, f"{pfx}.k_layer"),
                "v_layer": _linear(sd, f"{pfx}.v_layer"),
                "q_layer": _linear(sd, f"{pfx}.q_layer"),
                "output_layer": _linear(sd, f"{pfx}.output_layer")}

    dec: Dict[str, Any] = {
        "embedding": _linear(sd, "embedding"),
        "embedding_x": _linear(sd, "embedding_x"),
        "layer_norm": _torch_ln(sd, "layer_norm"),
        "output_layer": _linear(sd, "output_layer", bias=False),
    }
    for i in range(num_layers):
        q = f"layers.{i}"
        dec[f"layers_{i}"] = {
            "trg_trg_att": joey_mha(f"{q}.trg_trg_att"),
            "src_trg_att": joey_mha(f"{q}.src_trg_att"),
            "x_layer_norm": _torch_ln(sd, f"{q}.x_layer_norm"),
            "dec_layer_norm": _torch_ln(sd, f"{q}.dec_layer_norm"),
            "ff_layer_norm": _torch_ln(sd, f"{q}.feed_forward.layer_norm"),
            "ff_linear1": _linear(sd, f"{q}.feed_forward.pwff_layer.0"),
            "ff_linear2": _linear(sd, f"{q}.feed_forward.pwff_layer.3"),
        }
    return dec


# ------------------------------------------------------------- STGCN (eval)

def convert_stgcn(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """STGCN recognizer state_dict (recognition/models/stgcn.py:49-74,
    e.g. the released uestc_rot6d_stgcn.tar) -> flax STGCN variables plus
    the graph. Returns {'params', 'batch_stats', 'graph' (K, V, V)}.

    The graph is recovered from the checkpoint's registered 'A' buffer —
    so SMPL-layout recognizers load exactly without the kintree pickle
    their Graph constructor needs (stgcnutils/graph.py:59-73).
    """
    graph = _np(sd["A"]).astype(np.float32)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["data_bn"], stats["data_bn"] = _bn(sd, "data_bn")

    n_blocks = len({k.split(".")[1] for k in sd
                    if k.startswith("st_gcn_networks.")})
    for i in range(n_blocks):
        pfx = f"st_gcn_networks.{i}"
        bp: Dict[str, Any] = {"gcn_conv": _conv2d(sd, f"{pfx}.gcn.conv")}
        bs: Dict[str, Any] = {}
        # tcn Sequential: 0 BN, 1 ReLU, 2 Conv, 3 BN, 4 Dropout
        bp["tcn_bn1"], bs["tcn_bn1"] = _bn(sd, f"{pfx}.tcn.0")
        bp["tcn_conv"] = _conv2d(sd, f"{pfx}.tcn.2")
        bp["tcn_bn2"], bs["tcn_bn2"] = _bn(sd, f"{pfx}.tcn.3")
        if f"{pfx}.residual.0.weight" in sd:   # conv+BN residual branch
            bp["res_conv"] = _conv2d(sd, f"{pfx}.residual.0")
            bp["res_bn"], bs["res_bn"] = _bn(sd, f"{pfx}.residual.1")
        params[f"st_gcn_{i}"] = bp
        stats[f"st_gcn_{i}"] = bs
        if f"edge_importance.{i}" in sd:
            params[f"edge_importance_{i}"] = jnp.asarray(
                _np(sd[f"edge_importance.{i}"]))

    params["fcn"] = _conv2d(sd, "fcn")
    return {"params": params, "batch_stats": stats, "graph": graph}


def convert_stgcn_checkpoint(path: str) -> Dict[str, Any]:
    """Load + convert a torch STGCN recognizer file (.tar/.pth)."""
    return convert_stgcn(load_torch_file(path))
