"""Hard / soft NMS with a native C++ fast path.

Capability parity with extract_init_states/FaceBoxes/utils/nms/cpu_nms.pyx
(Cython hard-NMS :17-68 and soft-NMS :70-163) and py_cpu_nms.py. The native
implementation lives in dawn_tpu/runtime/src/nms.cpp (built to libdawn_rt.so,
bound via ctypes); this module falls back to vectorized numpy when the shared
library has not been built.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dawn_tpu.runtime import native


def nms_numpy(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy hard NMS. dets (N, 5) = [x1, y1, x2, y2, score]. Returns keep ids."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = (w * h) / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return np.asarray(keep, dtype=np.int64)


def nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Dispatch to the C++ implementation when available."""
    lib = native.load()
    if lib is not None:
        return native.nms(lib, dets, thresh)
    return nms_numpy(dets, thresh)


def soft_nms_numpy(dets: np.ndarray, sigma: float = 0.5, nt: float = 0.3,
                   threshold: float = 0.001, method: int = 1) -> np.ndarray:
    """Soft-NMS (linear method=1 / gaussian method=2 / hard otherwise).

    Mirrors cpu_soft_nms (cpu_nms.pyx:70-163); returns kept row indices into
    the (mutated-in-place score) dets copy.
    """
    dets = dets.copy()
    n = dets.shape[0]
    for i in range(n):
        max_pos = i + int(np.argmax(dets[i:, 4]))
        dets[[i, max_pos]] = dets[[max_pos, i]]
        tx1, ty1, tx2, ty2, _ = dets[i]
        area_i = (tx2 - tx1 + 1) * (ty2 - ty1 + 1)
        rest = dets[i + 1:]
        if rest.size == 0:
            break
        xx1 = np.maximum(tx1, rest[:, 0])
        yy1 = np.maximum(ty1, rest[:, 1])
        xx2 = np.minimum(tx2, rest[:, 2])
        yy2 = np.minimum(ty2, rest[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        areas = (rest[:, 2] - rest[:, 0] + 1) * (rest[:, 3] - rest[:, 1] + 1)
        ov = (w * h) / (area_i + areas - w * h)
        if method == 1:       # linear
            weight = np.where(ov > nt, 1 - ov, 1.0)
        elif method == 2:     # gaussian
            weight = np.exp(-(ov * ov) / sigma)
        else:                 # original hard
            weight = np.where(ov > nt, 0.0, 1.0)
        rest[:, 4] *= weight
    return np.where(dets[:, 4] > threshold)[0]
