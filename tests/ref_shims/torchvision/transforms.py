class _Unavailable:
    """Instantiable no-op (the reference calls T.ToTensor() at import time in a
    default arg); using an instance raises."""
    def __init__(self, *a, **k):
        pass
    def __call__(self, *a, **k):
        raise RuntimeError("torchvision shim: not available in tests")
ToPILImage = ToTensor = Resize = Compose = ColorJitter = _Unavailable
