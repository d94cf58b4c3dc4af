"""Shim for torchvision.models: the reference FlowDiffusion file imports it
at module scope for its (train-only) Vgg19 perceptual loss; inference parity
never instantiates it."""


def vgg19(*args, **kwargs):
    raise RuntimeError("torchvision shim: vgg19 weights are not available in "
                       "this image (train-only path)")
