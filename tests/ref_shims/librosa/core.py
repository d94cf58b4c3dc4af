def load(path, sr=None):
    raise NotImplementedError("shim: pass ndarrays, not file paths")
