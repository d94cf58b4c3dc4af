def disk(*args, **kwargs):
    raise RuntimeError("skimage shim: not available in tests")
