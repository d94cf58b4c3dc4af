"""Flax HuBERT vs transformers torch HubertModel (random small config)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp


@pytest.fixture(scope="module")
def pair():
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel
    from dawn_tpu.models.hubert import HubertConfig, HubertModel
    from dawn_tpu.weights.hubert_convert import convert_hubert

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), conv_bias=True, feat_extract_norm="layer",
        do_stable_layer_norm=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, layer_norm_eps=1e-5)
    tm = HFModel(hf_cfg).eval()

    cfg = HubertConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
                       conv_stride=(5, 2, 2), conv_bias=True,
                       feat_extract_norm="layer", do_stable_layer_norm=True,
                       num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4)
    variables = convert_hubert(dict(tm.state_dict()), cfg)
    return tm, HubertModel(cfg), variables


def test_hubert_parity(pair):
    tm, jm, variables = pair
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 1600).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav)).last_hidden_state.numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(wav)))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"hubert parity err {err}"
