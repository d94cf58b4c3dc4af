"""Released-checkpoint-scale converter parity (VERDICT round-1 item 7).

Round 1 only exercised the torch->flax converters at toy scale (UNet dim 16,
2 levels; LFG block_expansion 16). The released checkpoints are UNet dim 64 /
mults (1,2,4,8) / channels 275 (..._init_cond_test.py:140-155) and LFG
block_expansion 64 / max_features 512 / 2 down blocks / 6 bottleneck blocks /
10 regions (config/hdtf128.yaml:82-93). These tests build the REFERENCE nets
at that exact depth, convert, and compare one forward on tiny spatial shapes
— so a key mis-mapping at real depth surfaces here, not when DAWN_128.pth is
first loaded.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.join(HERE, "ref_shims"), "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)

@pytest.fixture(autouse=True)
def _seed_torch():
    # reseed per TEST, not per import: pytest collects all modules first and
    # other tests consume the global torch RNG, so module-level seeding gives
    # selection-order-dependent (irreproducible) weights
    torch.manual_seed(0)


def test_unet3d_full_scale_converter():
    import importlib
    ref_mod = importlib.import_module(
        "DM_3.modules.video_flow_diffusion_multiGPU_v0_crema_plus_faceemb_ca_multi_test")
    from dawn_tpu.models.dm import Unet3D
    from dawn_tpu.weights import convert_unet3d

    T, H = 2, 8   # 3 downsamples: 8 -> 4 -> 2 -> 1
    tnet = ref_mod.Unet3D(
        dim=64, cond_dim=1024 + 6 + 2, cond_aud=1024, cond_pose=6,
        cond_eye=2, num_frames=T, channels=3 + 256 + 16, out_grid_dim=2,
        out_conf_dim=1, dim_mults=(1, 2, 4, 8), use_hubert_audio_cond=True,
        learn_null_cond=False, use_final_activation=False, use_deconv=True,
        win_width=40).eval()
    jnet = Unet3D(dim=64, dim_mults=(1, 2, 4, 8), channels=275, cond_pose=6,
                  win_width=40)
    variables = convert_unet3d(
        {k: v for k, v in tnet.state_dict().items()}, num_levels=4)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 275, T, H, H).astype(np.float32) * 0.3
    tvec = np.array([500])
    cond = rng.randn(1, T, 1032).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x), torch.from_numpy(tvec),
                   cond=torch.from_numpy(cond), null_cond_prob=0.0)
    got = jnet.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
                     jnp.asarray(tvec, jnp.int32), jnp.asarray(cond))
    ref_n = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    err = np.abs(np.asarray(got) - ref_n).max()
    assert err < 2e-3, f"full-scale UNet converter parity: max err {err}"


def test_hubert_large_full_scale_converter():
    """hubert-large topology (24 x 1024, conv-pos k=128 even-kernel trim,
    stable-LN) through convert_hubert with random HF weights (VERDICT r3 #4).

    The small-config test (test_parity_hubert.py) covers the math; this one
    covers the RELEASED topology — 24 layers, 16 heads, intermediate 4096,
    7-layer conv stack kernel (10,3,3,3,3,2,2) stride (5,2,2,2,2,2,2) — so a
    key mis-mapping at real depth surfaces before hubert-large-ls960-ft is
    first loaded. Ref: unified_video_generator.py:67-72 (model choice),
    process_audio_hubert_interpolate_demo.py:34-94 (usage).
    """
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel
    from dawn_tpu.models.hubert import HubertConfig, HubertModel
    from dawn_tpu.weights.hubert_convert import convert_hubert

    hf_cfg = HFConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, conv_dim=(512,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        layer_norm_eps=1e-5)
    tm = HFModel(hf_cfg).eval()

    cfg = HubertConfig.large()           # the deployed config, verbatim
    variables = convert_hubert(dict(tm.state_dict()), cfg)

    rng = np.random.RandomState(1)
    wav = rng.randn(1, 8000).astype(np.float32)      # 0.5 s -> T=24 frames
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav)).last_hidden_state.numpy()
    got = np.asarray(HubertModel(cfg).apply(variables, jnp.asarray(wav)))
    assert got.shape == ref.shape == (1, 24, 1024), (got.shape, ref.shape)
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"hubert-large full-scale parity err {err}"


def test_hubert_chunked_boundary_production_geometry():
    """Chunk bookkeeping at a clip-boundary-straddling length (VERDICT r3 #4).

    Uses the PRODUCTION conv geometry (fused kernel 400 / stride 320 — the
    numbers the clip bookkeeping is derived from) with thin channels so a
    1.5-clip wav (480 000 samples, 30 s) is cheap. Asserts (a) our clip
    bounds equal the reference loop's indices
    (process_audio_hubert_interpolate_demo.py:56-94), (b) the flax chunked
    pipeline output matches torch HF run over the same chunks, (c) the
    expected-length contract (T = (S - 80) // 320) holds.
    """
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel
    from dawn_tpu.models.hubert import HubertConfig, HubertModel
    from dawn_tpu.weights.hubert_convert import convert_hubert
    from dawn_tpu.pipeline import audio as audio_mod

    hf_cfg = HFConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        layer_norm_eps=1e-5)
    tm = HFModel(hf_cfg).eval()
    cfg = HubertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16)
    variables = convert_hubert(dict(tm.state_dict()), cfg)
    jm = HubertModel(cfg)

    total = 480_000                      # 1.5 clips: [0, 320080) + [320000, 480000)
    rng = np.random.RandomState(2)
    wav = (rng.randn(total) * 0.1).astype(np.float32)

    # (a) bounds == the reference loop's indices, re-derived here
    kernel, stride, clip_length = 400, 320, 320 * 1000
    num_iter = total // clip_length
    ref_bounds = []
    for i in range(num_iter):
        s = 0 if i == 0 else clip_length * i
        ref_bounds.append((s, s + clip_length - stride + kernel))
    if total - clip_length * num_iter >= kernel:
        ref_bounds.append((clip_length * num_iter, total))
    bounds, expected_t = audio_mod.hubert_clip_bounds(total)
    assert bounds == ref_bounds, (bounds, ref_bounds)
    assert expected_t == (total - (kernel - stride)) // stride == 1499

    # (b) flax chunked pipeline vs torch over the same chunks
    feats = audio_mod.hubert_features(
        wav, lambda w: np.asarray(jm.apply(variables, jnp.asarray(w))))
    norm = audio_mod.zero_mean_unit_var(wav)[None]
    with torch.no_grad():
        ref_chunks = [tm(torch.from_numpy(norm[:, s:e])).last_hidden_state[0]
                      .numpy() for s, e in ref_bounds]
    ref = np.concatenate(ref_chunks, axis=0)[:expected_t]

    # (c) length contract
    assert feats.shape == (expected_t, 64) and ref.shape[0] == expected_t
    err = np.abs(feats - ref).max()
    assert err < 5e-4, f"chunked hubert parity err {err}"


def test_lfg_full_scale_converter():
    from LFG.modules.generator import Generator as TorchGenerator
    from dawn_tpu.models.lfg import LFGGenerator
    from dawn_tpu.weights import convert_lfg_generator

    tgen = TorchGenerator(num_channels=3, num_regions=10, block_expansion=64,
                          max_features=512, num_down_blocks=2,
                          num_bottleneck_blocks=6, skips=True,
                          pixelwise_flow_predictor_params=None).eval()
    from conftest import randomize_bn_stats
    randomize_bn_stats(tgen)

    jgen = LFGGenerator(block_expansion=64, max_features=512,
                        num_down_blocks=2, num_bottleneck_blocks=6)
    variables = convert_lfg_generator(
        {k: v for k, v in tgen.state_dict().items()},
        num_down_blocks=2, num_bottleneck=6)["generator"]

    rng = np.random.RandomState(4)
    img = rng.rand(1, 3, 32, 32).astype(np.float32)
    flow = (rng.rand(1, 8, 8, 2).astype(np.float32) * 2 - 1)
    conf = rng.rand(1, 8, 8, 1).astype(np.float32)
    with torch.no_grad():
        fea = tgen.compute_fea(torch.from_numpy(img))
        # reference forward_with_flow takes the flow as a (B, h, w, 2)
        # sampling grid and the occlusion as (B, 1, h, w) (generator.py:61-69)
        tout = tgen.forward_with_flow(
            torch.from_numpy(img), torch.from_numpy(flow),
            torch.from_numpy(np.transpose(conf, (0, 3, 1, 2))))
    got_fea = jgen.apply(variables, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                         method=LFGGenerator.compute_fea)
    err_fea = np.abs(np.asarray(got_fea)
                     - np.transpose(fea.numpy(), (0, 2, 3, 1))).max()
    got = jgen.apply(variables, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                     jnp.asarray(flow), jnp.asarray(conf),
                     method=LFGGenerator.decode_with_flow)
    err_out = np.abs(np.asarray(got["prediction"])
                     - np.transpose(tout["prediction"].numpy(),
                                    (0, 2, 3, 1))).max()
    assert err_fea < 1e-3, f"full-scale LFG fea parity: {err_fea}"
    assert err_out < 1e-3, f"full-scale LFG decode parity: {err_out}"
