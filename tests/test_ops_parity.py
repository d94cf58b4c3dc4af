"""Parity of dawn_tpu.ops primitives against torch's exact numerics (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dawn_tpu import ops
from dawn_tpu.ops.convs import torch_conv_weight, torch_conv_transpose_weight

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestGridSample:
    @pytest.mark.parametrize("hw,ohw", [((32, 32), (32, 32)), ((128, 128), (64, 48))])
    def test_matches_torch_defaults(self, hw, ohw):
        img = RNG.randn(2, *hw, 3).astype(np.float32)
        # include out-of-range coords to exercise zero padding
        grid = (RNG.rand(2, *ohw, 2).astype(np.float32) * 2.6 - 1.3)
        ref = F.grid_sample(nchw(img), torch.from_numpy(grid))
        got = ops.grid_sample(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=2e-5)

    def test_shared_equals_broadcast(self):
        # the decode hot path: one source per identity, T flow fields —
        # must equal broadcasting the source to (B*T, ...) + plain sampling
        from dawn_tpu.ops.resample import grid_sample_shared
        b, t, hw, ohw = 2, 5, (32, 32), (24, 24)
        img = RNG.randn(b, *hw, 4).astype(np.float32)
        grid = (RNG.rand(b, t, *ohw, 2).astype(np.float32) * 2.4 - 1.2)
        bc = np.broadcast_to(img[:, None], (b, t) + img.shape[1:]).reshape(
            (b * t,) + img.shape[1:])
        ref = ops.grid_sample(jnp.asarray(bc),
                              jnp.asarray(grid.reshape((b * t,) + grid.shape[2:])))
        got = grid_sample_shared(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(
            np.asarray(got).reshape(np.asarray(ref).shape), np.asarray(ref),
            atol=1e-6)


class TestInterpolate:
    @pytest.mark.parametrize("ihw,ohw", [((32, 32), (128, 128)), ((17, 23), (32, 32)),
                                         ((64, 64), (32, 32))])
    def test_bilinear(self, ihw, ohw):
        img = RNG.randn(2, *ihw, 5).astype(np.float32)
        ref = F.interpolate(nchw(img), size=ohw, mode="bilinear")
        got = ops.interpolate_bilinear(jnp.asarray(img), *ohw)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=2e-5)

    @pytest.mark.parametrize("ihw,ohw", [((16, 16), (32, 32)), ((15, 20), (31, 44))])
    def test_nearest(self, ihw, ohw):
        img = RNG.randn(1, *ihw, 4).astype(np.float32)
        ref = F.interpolate(nchw(img), size=ohw, mode="nearest")
        got = ops.interpolate_nearest(jnp.asarray(img), *ohw)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=0)

    def test_avg_pool(self):
        img = RNG.randn(2, 32, 32, 7).astype(np.float32)
        ref = F.avg_pool2d(nchw(img), 2)
        got = ops.avg_pool_2x2(jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-6)


class TestNorms:
    def test_group_norm(self):
        x = RNG.randn(2, 8, 8, 64).astype(np.float32)
        w = RNG.randn(64).astype(np.float32)
        b = RNG.randn(64).astype(np.float32)
        ref = F.group_norm(nchw(x), 8, torch.from_numpy(w), torch.from_numpy(b))
        got = ops.group_norm(jnp.asarray(x), 8, jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-4)

    def test_channel_layer_norm_biased_var(self):
        # reference LayerNorm: (x - mean)/sqrt(var_biased + eps) * gamma
        x = RNG.randn(3, 10, 64).astype(np.float32)
        g = RNG.randn(64).astype(np.float32)
        xt = torch.from_numpy(x)
        var = torch.var(xt, dim=-1, unbiased=False, keepdim=True)
        mean = torch.mean(xt, dim=-1, keepdim=True)
        ref = (xt - mean) / (var + 1e-5).sqrt() * torch.from_numpy(g)
        got = ops.channel_layer_norm(jnp.asarray(x), jnp.asarray(g))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)

    def test_layer_norm(self):
        x = RNG.randn(4, 7, 32).astype(np.float32)
        w = RNG.randn(32).astype(np.float32)
        b = RNG.randn(32).astype(np.float32)
        ref = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w),
                           torch.from_numpy(b))
        got = ops.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)

    def test_batch_norm_inference(self):
        x = RNG.randn(2, 8, 8, 16).astype(np.float32)
        w, b = RNG.randn(16).astype(np.float32), RNG.randn(16).astype(np.float32)
        m, v = RNG.randn(16).astype(np.float32), RNG.rand(16).astype(np.float32) + 0.5
        ref = F.batch_norm(nchw(x), torch.from_numpy(m), torch.from_numpy(v),
                           torch.from_numpy(w), torch.from_numpy(b), training=False)
        got = ops.batch_norm_inference(jnp.asarray(x), jnp.asarray(m), jnp.asarray(v),
                                       jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-4)


class TestConvs:
    def test_conv2d(self):
        x = RNG.randn(2, 16, 16, 8).astype(np.float32)
        w = RNG.randn(12, 8, 3, 3).astype(np.float32)
        b = RNG.randn(12).astype(np.float32)
        ref = F.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b), padding=1)
        got = ops.conv2d_torch(jnp.asarray(x), torch_conv_weight(w), jnp.asarray(b),
                               padding=1)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-4)

    def test_conv2d_stride2_k7(self):
        x = RNG.randn(1, 33, 33, 3).astype(np.float32)
        w = RNG.randn(5, 3, 7, 7).astype(np.float32)
        ref = F.conv2d(nchw(x), torch.from_numpy(w), None, stride=2, padding=3)
        got = ops.conv2d_torch(jnp.asarray(x), torch_conv_weight(w), None,
                               stride=2, padding=3)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-4)

    def test_conv_transpose2d_k4s2p1(self):
        # the UNet Upsample: ConvTranspose3d (1,4,4) stride (1,2,2) pad (0,1,1)
        x = RNG.randn(2, 8, 8, 6).astype(np.float32)
        w = RNG.randn(6, 6, 4, 4).astype(np.float32)  # (in, out, kh, kw)
        b = RNG.randn(6).astype(np.float32)
        ref = F.conv_transpose2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                                 stride=2, padding=1)
        got = ops.conv_transpose2d_torch(
            jnp.asarray(x), torch_conv_transpose_weight(w), jnp.asarray(b),
            stride=2, padding=1)
        assert got.shape == (2, 16, 16, 6)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-4)


class TestScheduleAndBias:
    def test_cosine_schedule_matches_torch_f64(self):
        t = 1000
        steps = t + 1
        x = torch.linspace(0, t, steps, dtype=torch.float64)
        ac = torch.cos(((x / t) + 0.008) / 1.008 * torch.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.9999)
        ours = ops.cosine_beta_schedule(t)
        np.testing.assert_allclose(ours, betas.numpy(), rtol=1e-12)

    def test_bucket_ids_match_torch(self):
        import math
        n = 64
        num_buckets, max_distance = 32, 32
        q = torch.arange(n)[:, None]
        k = torch.arange(n)[None, :]
        rel = k - q
        # torch reference formula (ca_multi_test.py:91-109)
        ret = 0
        neg = -rel
        nb = num_buckets // 2
        ret = ret + (neg < 0).long() * nb
        neg = neg.abs()
        max_exact = nb // 2
        is_small = neg < max_exact
        val_if_large = max_exact + (
            torch.log(neg.float() / max_exact) / math.log(max_distance / max_exact)
            * (nb - max_exact)).long()
        val_if_large = torch.min(val_if_large, torch.full_like(val_if_large, nb - 1))
        ref = (ret + torch.where(is_small, neg, val_if_large)).numpy()
        from dawn_tpu.ops.t5bias import t5_bucket_ids
        np.testing.assert_array_equal(t5_bucket_ids(n, num_buckets, max_distance), ref)

    def test_windowed_vector_matches_matrix(self):
        emb = jnp.asarray(RNG.randn(32, 8).astype(np.float32))
        n, w = 50, 10
        full = ops.t5_bias_matrix(emb, n, 32, 32) + jnp.asarray(ops.window_mask(n, w))
        vec = ops.t5_bias_windowed_vector(emb, w, 32, 32)
        for i in (0, 17, 49):
            for j in range(n):
                rel = j - i
                if abs(rel) <= w:
                    np.testing.assert_allclose(full[3, i, j], vec[3, rel + w], atol=0)
                else:
                    assert float(full[3, i, j]) <= -1e7

    def test_ddim_times(self):
        """Bit-exact vs the reference's torch.linspace grid for EVERY step
        count, not just the shipped S=20 — torch's f32 linspace + int
        truncation produces off-by-one indices at some S that a float64
        linspace misses (e.g. S=25: 500 vs 499)."""
        from dawn_tpu.ops.schedule import ddim_times
        for s in list(range(1, 300)) + [999]:
            times = torch.linspace(0.0, 1000, steps=s + 2)[:-1]
            times = list(reversed(times.int().tolist()))
            ref = list(zip(times[:-1], times[1:]))
            assert ddim_times(1000, s) == ref, s


class TestRotary:
    def test_rotary_full_dim(self):
        # Independent formula check: matches lucidrains' interleaved rotation.
        d, n = 32, 20
        x = RNG.randn(2, 4, n, d).astype(np.float32)
        cos, sin = ops.rotary_cos_sin(n, d)
        got = np.asarray(ops.apply_rotary(jnp.asarray(x), cos, sin))
        inv = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
        freqs = np.outer(np.arange(n), inv)
        ref = np.empty_like(x)
        c, s = np.cos(freqs), np.sin(freqs)
        ref[..., 0::2] = x[..., 0::2] * c - x[..., 1::2] * s
        ref[..., 1::2] = x[..., 1::2] * c + x[..., 0::2] * s
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_rotary_partial_dim_passthrough(self):
        # PBnet uses RotaryEmbedding(4) on 32-dim heads: only first 4 rotate.
        d, rot, n = 32, 4, 11
        x = RNG.randn(1, 2, n, d).astype(np.float32)
        cos, sin = ops.rotary_cos_sin(n, rot)
        got = np.asarray(ops.apply_rotary(jnp.asarray(x), cos, sin))
        np.testing.assert_array_equal(got[..., rot:], x[..., rot:])
        assert not np.allclose(got[..., 1:rot], x[..., 1:rot])


class TestResampleMisc:
    """misc.py resample/get_grid parity (align_corners=True, border pad)."""

    def test_resample_matches_torch(self):
        import torch
        import torch.nn.functional as F
        import jax.numpy as jnp
        from dawn_tpu.utils.misc import resample, get_grid

        r = np.random.RandomState(0)
        img = r.rand(2, 16, 16, 3).astype(np.float32)
        flow = (r.rand(2, 16, 16, 2).astype(np.float32) - 0.5) * 6
        grid_t = torch.from_numpy(np.array(get_grid(2, (16, 16)))).permute(0, 3, 1, 2)
        flow_t = torch.from_numpy(flow).permute(0, 3, 1, 2)
        flow_n = torch.cat([flow_t[:, 0:1] / 7.5, flow_t[:, 1:2] / 7.5], 1)
        fin = (grid_t + flow_n).permute(0, 2, 3, 1)
        ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2), fin,
                            mode="bilinear", padding_mode="border",
                            align_corners=True).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resample(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_grid_sample_border_align_matches_torch(self):
        import torch
        import torch.nn.functional as F
        import jax.numpy as jnp
        from dawn_tpu.ops.resample import grid_sample

        r = np.random.RandomState(1)
        img = r.rand(2, 9, 11, 3).astype(np.float32)
        grid = (r.rand(2, 7, 5, 2).astype(np.float32) - 0.5) * 2.6  # out of range
        ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                            torch.from_numpy(grid), mode="bilinear",
                            padding_mode="border",
                            align_corners=True).permute(0, 2, 3, 1).numpy()
        got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                     align_corners=True,
                                     padding_mode="border"))
        np.testing.assert_allclose(got, ref, atol=1e-5)
