"""Pure-python reader for torch ``.pth`` checkpoints — no torch import.

The TPU deployment image needs none of torch's compute; requiring it just to
unpickle the released checkpoints (DAWN_*.pth / LFG_*.pth / PBnet
checkpoint_*.pth.tar, formats per SURVEY.md section 2.7) would drag the whole
dependency in. ``torch.save`` since 1.6 writes a zip archive containing
``<name>/data.pkl`` (a pickle whose tensors are persistent-id references)
plus one raw little-endian buffer per storage under ``<name>/data/<key>``.
This module re-implements exactly that much of ``torch.load``:

- a restricted Unpickler whose ``find_class`` maps the handful of torch
  globals a state_dict pickle can contain (storage type tags,
  ``_rebuild_tensor_v2``, ``_rebuild_parameter``, OrderedDict, Size) onto
  numpy-producing equivalents and REFUSES everything else (safer than
  ``torch.load(weights_only=False)``: no arbitrary-code reduce paths),
- ``persistent_load`` resolving ``('storage', type, key, location, numel)``
  ids to lazily-read numpy buffers,
- ``_rebuild_tensor_v2`` as an ``as_strided`` view + contiguous copy
  (torch strides are in elements, numpy's in bytes).

Legacy pre-1.6 (non-zip) files fall back to torch when available.
"""

from __future__ import annotations

import io
import os
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype (all little-endian on disk)
_STORAGE_DTYPES: Dict[str, Any] = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("bool"),
}


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax
    return np.dtype(ml_dtypes.bfloat16)


class _StorageTag:
    """Stand-in for a torch storage class appearing as a pickle GLOBAL."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


def _rebuild_tensor_v2(storage: np.ndarray, storage_offset: int, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    size = tuple(size)
    stride = tuple(stride)
    if np.prod(size, dtype=np.int64) == 0:
        return np.zeros(size, dtype=storage.dtype)
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    """Unpickler restricted to the globals a tensor state_dict can contain."""

    def __init__(self, file, read_storage):
        super().__init__(file, encoding="utf-8")
        self._read_storage = read_storage

    def find_class(self, module: str, name: str):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTag(_STORAGE_DTYPES[name])
        if module == "torch" and name == "BFloat16Storage":
            return _StorageTag(_bfloat16_dtype())
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch" and name == "Size":
            return tuple
        # numpy objects occasionally embedded in checkpoint dicts (scalars,
        # small arrays). Closed per-name whitelist — NOT the whole module:
        # numpy's top level exports file-touching callables (save/load/
        # fromfile) that a crafted pickle could otherwise invoke via REDUCE.
        if (module in ("numpy.core.multiarray", "numpy._core.multiarray")
                and name in ("_reconstruct", "scalar")):
            return super().find_class(module, name)
        if module == "numpy" and name in ("ndarray", "dtype"):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} "
            f"(not part of a plain tensor checkpoint)")

    def persistent_load(self, pid):
        # ('storage', storage_type, key(str), location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, tag, key, _location, numel = pid
        if not isinstance(tag, _StorageTag):
            raise pickle.UnpicklingError(f"unknown storage type in {pid!r}")
        return self._read_storage(str(key), tag.dtype, int(numel))


def load_pth_zip(path: str) -> Any:
    """Load a torch>=1.6 zip-format checkpoint into numpy arrays."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names
                        if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]

        def read_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            raw = zf.read(f"{prefix}data/{key}")
            return np.frombuffer(raw, dtype=dtype, count=numel)

        up = _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), read_storage)
        return up.load()


def load_pth(path: str) -> Any:
    """Load a ``.pth``/``.pth.tar`` checkpoint without torch.

    zip-format (torch >= 1.6 — all DAWN released checkpoints) is read
    natively; legacy files fall back to ``torch.load`` when torch exists.
    """
    if not os.path.exists(path):
        # zipfile.is_zipfile swallows FileNotFoundError -> a path typo would
        # otherwise surface as a misleading "no module named torch"
        raise FileNotFoundError(f"checkpoint not found: {path}")
    if zipfile.is_zipfile(path):
        return load_pth_zip(path)
    import torch  # legacy (pre-1.6) format only
    return torch.load(path, map_location="cpu", weights_only=False)
