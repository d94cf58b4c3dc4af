"""Host-side face preparation: detection -> 3DMM -> init pose/eye/bbox.

Capability parity with the reference's layer-1 stack (extract_init_states/):
FaceBoxes detection (scale-to-<=720x1080, mean subtract, anchors, decode,
confidence filter 0.05, top-5000, NMS 0.3, keep-750, vis 0.2 —
FaceBoxes_ONNX.py:56-143), TDDFA 120x120 crop + (x-127.5)/128 normalization +
62-param regression (TDDFA_ONNX.py:74-103), dense BFM reconstruction, and the
pose/eye/bbox descriptor math (dawn_tpu.models.face3d).

The CNN backbones run through a pluggable callable so any of {onnxruntime
session, converted flax net, torch module} can serve; the stripped-asset
snapshot means this stage activates only when the user supplies the nets.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from dawn_tpu.models.face3d.priors import prior_boxes, decode_boxes
from dawn_tpu.models.face3d.nms import nms
from dawn_tpu.models.face3d.pose import get_pose, calculate_bbox, calculate_eye

MAX_H, MAX_W = 720, 1080
BGR_MEAN = np.array([104.0, 117.0, 123.0], np.float32)
CONF_THRESH = 0.05
TOP_K = 5000
NMS_THRESH = 0.3
KEEP_TOP_K = 750
VIS_THRESH = 0.2


def detect_faces(img_bgr: np.ndarray,
                 backbone: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]
                 ) -> np.ndarray:
    """FaceBoxes post-processing pipeline. backbone: NCHW float -> (loc, conf).

    Returns (N, 5) [x1, y1, x2, y2, score] boxes above VIS_THRESH in original
    image coordinates.
    """
    h, w = img_bgr.shape[:2]
    scale = 1.0
    if h > MAX_H:
        scale = MAX_H / h
    if w * scale > MAX_W:
        scale *= MAX_W / (w * scale)
    if scale != 1.0:
        import cv2
        img_bgr = cv2.resize(img_bgr, (int(scale * w), int(scale * h)))
    hs, ws = img_bgr.shape[:2]

    x = img_bgr.astype(np.float32) - BGR_MEAN
    x = np.transpose(x, (2, 0, 1))[None]
    loc, conf = backbone(x)
    loc, conf = np.asarray(loc)[0], np.asarray(conf)[0]

    priors = prior_boxes((hs, ws))
    boxes = decode_boxes(loc, priors)
    boxes = boxes * np.array([ws, hs, ws, hs], np.float32) / scale
    scores = conf[:, 1]

    keep = scores > CONF_THRESH
    boxes, scores = boxes[keep], scores[keep]
    order = scores.argsort()[::-1][:TOP_K]
    boxes, scores = boxes[order], scores[order]

    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    keep_ids = nms(dets, NMS_THRESH)
    dets = dets[keep_ids][:KEEP_TOP_K]
    return dets[dets[:, 4] >= VIS_THRESH]


def parse_roi_box_from_bbox(bbox: Sequence[float]) -> np.ndarray:
    """Square ROI box around a detection (utils/functions.py:65-82)."""
    left, top, right, bottom = bbox[:4]
    old_size = (right - left + bottom - top) / 2
    center_x = right - (right - left) / 2.0
    center_y = bottom - (bottom - top) / 2.0 + old_size * 0.14
    size = int(old_size * 1.58)
    roi = np.zeros(4)
    roi[0] = center_x - size / 2
    roi[1] = center_y - size / 2
    roi[2] = roi[0] + size
    roi[3] = roi[1] + size
    return roi


def crop_img(img: np.ndarray, roi_box: Sequence[float]) -> np.ndarray:
    """Zero-padded crop (utils/functions.py:23-63)."""
    h, w = img.shape[:2]
    sx, sy, ex, ey = [int(round(v)) for v in roi_box[:4]]
    dh, dw = ey - sy, ex - sx
    res = (np.zeros((dh, dw, 3), dtype=img.dtype) if img.ndim == 3
           else np.zeros((dh, dw), dtype=img.dtype))
    if sx < 0:
        sx, dsx = 0, -sx
    else:
        dsx = 0
    if ex > w:
        ex, dex = w, dw - (ex - w)
    else:
        dex = dw
    if sy < 0:
        sy, dsy = 0, -sy
    else:
        dsy = 0
    if ey > h:
        ey, dey = h, dh - (ey - h)
    else:
        dey = dh
    res[dsy:dey, dsx:dex] = img[sy:ey, sx:ex]
    return res


def regress_3dmm(img_bgr: np.ndarray, boxes: np.ndarray,
                 backbone: Callable[[np.ndarray], np.ndarray],
                 size: int = 120,
                 param_mean: Optional[np.ndarray] = None,
                 param_std: Optional[np.ndarray] = None):
    """Per-face 62-param regression (TDDFA_ONNX.__call__, :74-103)."""
    import cv2
    params, rois = [], []
    for box in boxes:
        roi = parse_roi_box_from_bbox(box)
        crop = crop_img(img_bgr, roi)
        crop = cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
        inp = (crop.astype(np.float32) - 127.5) / 128.0
        inp = np.transpose(inp, (2, 0, 1))[None]
        param = np.asarray(backbone(inp)).reshape(-1).astype(np.float32)
        if param_mean is not None:
            param = param * param_std + param_mean
        params.append(param)
        rois.append(roi)
    return params, rois


def extract_init_states(image_path: str,
                        assets_dir: Optional[str] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Image -> (pose (1,7), eye_bbox (1,8)). Needs the 3DDFA/FaceBoxes assets
    (onnx files or converted weights) under ``assets_dir``."""
    import cv2
    if assets_dir is None:
        raise RuntimeError("3DDFA assets not configured")
    try:
        import onnxruntime as ort  # optional
    except ImportError as e:
        raise RuntimeError("onnxruntime not available for 3DDFA assets") from e

    import os
    fb = ort.InferenceSession(os.path.join(assets_dir, "FaceBoxesProd.onnx"),
                              providers=["CPUExecutionProvider"])
    td = ort.InferenceSession(os.path.join(assets_dir, "mb1_120x120.onnx"),
                              providers=["CPUExecutionProvider"])
    bfm = ort.InferenceSession(os.path.join(assets_dir, "bfm_noneck_v3.onnx"),
                               providers=["CPUExecutionProvider"])

    img = cv2.imread(image_path)
    if img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_RGBA2RGB)

    boxes = detect_faces(img, lambda x: fb.run(None, {fb.get_inputs()[0].name: x}))
    if len(boxes) == 0:
        raise ValueError(f"no face detected in {image_path}")

    # the mb1 onnx emits Z-SCORED params; the reference denormalizes with the
    # shipped mean/std pickle (TDDFA_ONNX.py:56-71,100) — without it the pose
    # decomposition downstream is garbage, so its absence is an error
    import pickle
    for cand in (os.path.join(assets_dir, "param_mean_std_62d_120x120.pkl"),
                 os.path.join(assets_dir, "configs",
                              "param_mean_std_62d_120x120.pkl")):
        if os.path.exists(cand):
            with open(cand, "rb") as f:
                ms = pickle.load(f)
            param_mean = np.asarray(ms.get("mean"), np.float32)
            param_std = np.asarray(ms.get("std"), np.float32)
            break
    else:
        raise FileNotFoundError(
            f"param_mean_std_62d_120x120.pkl not found under {assets_dir} "
            f"(required to denormalize the 62-d regression output)")

    params, rois = regress_3dmm(
        img, boxes[:1], lambda x: td.run(None, {td.get_inputs()[0].name: x})[0],
        param_mean=param_mean, param_std=param_std)

    # dense reconstruction through the BFM onnx graph (TDDFA_ONNX.py:105-125)
    from dawn_tpu.models.face3d.bfm import parse_param_62, similar_transform
    R, offset, alpha_shp, alpha_exp = parse_param_62(params[0])
    pts = bfm.run(None, {"R": R.astype(np.float32), "offset": offset.astype(np.float32),
                         "alpha_shp": alpha_shp.astype(np.float32),
                         "alpha_exp": alpha_exp.astype(np.float32)})[0]
    ver = similar_transform(pts, rois[0], 120)

    pose = get_pose(params).reshape(1, 7)
    left, right = calculate_eye(ver)
    bbox = calculate_bbox(img.shape, ver)
    eye_bbox = np.zeros((1, 8), np.float32)
    eye_bbox[0, 0] = np.sum(left)
    eye_bbox[0, 1] = np.sum(right)
    eye_bbox[0, 2:] = np.asarray(bbox, np.float32)
    return pose.astype(np.float32), eye_bbox
