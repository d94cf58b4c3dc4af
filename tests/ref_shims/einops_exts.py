"""Shim for einops_exts (not installed): the reference only uses rearrange_many."""

from einops import rearrange


def rearrange_many(tensors, pattern, **kwargs):
    return tuple(rearrange(t, pattern, **kwargs) for t in tensors)
