"""API-compatible shim for lucidrains' rotary-embedding-torch.

The real package is not installed in this image; the reference code under
/root/reference imports it. This shim reimplements the subset of its public
behavior the reference uses (``RotaryEmbedding(dim).rotate_queries_or_keys``)
with the library's documented semantics: interleaved GPT-J pair rotation,
theta=10000, partial rotation of the first ``dim`` channels, rotation applied
along the -2 (or -3 when seq_before_head_dim=True) axis.
"""

import torch
from torch import nn
from einops import rearrange, repeat


def _rotate_half(x):
    x = rearrange(x, "... (d r) -> ... d r", r=2)
    x1, x2 = x.unbind(dim=-1)
    x = torch.stack((-x2, x1), dim=-1)
    return rearrange(x, "... d r -> ... (d r)")


class RotaryEmbedding(nn.Module):
    def __init__(self, dim, theta=10000, seq_before_head_dim=False, **kwargs):
        super().__init__()
        freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
        self.register_buffer("freqs", freqs)
        self.default_seq_dim = -3 if seq_before_head_dim else -2

    def rotate_queries_or_keys(self, t, seq_dim=None):
        seq_dim = self.default_seq_dim if seq_dim is None else seq_dim
        seq_len = t.shape[seq_dim]
        pos = torch.arange(seq_len, dtype=self.freqs.dtype, device=t.device)
        freqs = torch.einsum("i,j->ij", pos, self.freqs)
        freqs = repeat(freqs, "... n -> ... (n r)", r=2)
        if seq_dim == -3:
            freqs = rearrange(freqs, "n d -> n 1 d")
        rot_dim = freqs.shape[-1]
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        t_rot = t_rot * freqs.cos() + _rotate_half(t_rot) * freqs.sin()
        return torch.cat((t_rot, t_pass), dim=-1)
