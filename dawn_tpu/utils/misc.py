"""Shared infra: logging, meters, seeding, flow visualization.

Capability parity with misc.py at the reference root: Logger (tee stdout to a
log file, :86-96), AverageMeter (train...6D.py:504-520), seeding
(run_hdtf.py:42-48 setup_seed), and the flow/confidence visualization helpers
(grid2fig :44, flow2fig :68, conf2fig :79) used by training monitoring. The
reference's flow_vis dependency is replaced by an in-repo flow colorwheel.
"""

from __future__ import annotations

import os
import random
import sys
from typing import Optional

import numpy as np


class Logger:
    """Tee stdout to a file (reference misc.py:86-96)."""

    def __init__(self, path: str, stream=None):
        self.terminal = stream or sys.stdout
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.log = open(path, "a")

    def write(self, message: str):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()


class AverageMeter:
    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:.4f} ({self.avg:.4f})"


def setup_seed(seed: int = 1234):
    """Seed host RNGs (numpy/python); JAX keys are explicit everywhere."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


# ------------------------------------------------------------ visualization

def _flow_colorwheel() -> np.ndarray:
    """Standard 55-color optical-flow wheel (Baker et al.)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    cols = []
    for i in range(ry):
        cols.append([255, 255 * i / ry, 0])
    for i in range(yg):
        cols.append([255 - 255 * i / yg, 255, 0])
    for i in range(gc):
        cols.append([0, 255, 255 * i / gc])
    for i in range(cb):
        cols.append([0, 255 - 255 * i / cb, 255])
    for i in range(bm):
        cols.append([255 * i / bm, 0, 255])
    for i in range(mr):
        cols.append([255, 0, 255 - 255 * i / mr])
    return np.asarray(cols, np.float32)


def flow_to_color(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 visualization."""
    wheel = _flow_colorwheel()
    ncols = wheel.shape[0]
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u * u + v * v)
    rad = rad / max(rad.max(), 1e-6)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col = wheel[k0] * (1 - f) + wheel[k1] * f
    col = 255 - rad[..., None] * (255 - col)
    return col.astype(np.uint8)


def grid2fig(warped_grid: np.ndarray, grid_size: int = 32,
             img_size: int = 256) -> np.ndarray:
    """Deformation grid lines -> image (reference misc.py:44-66)."""
    img = np.full((img_size, img_size, 3), 255, np.uint8)
    g = (warped_grid + 1) / 2 * (img_size - 1)
    g = g.reshape(grid_size, grid_size, 2).astype(int)
    g = np.clip(g, 0, img_size - 1)
    for i in range(grid_size):
        for j in range(grid_size - 1):
            p0, p1 = g[i, j], g[i, j + 1]
            _line(img, p0, p1)
            p0, p1 = g[j, i], g[j + 1, i]
            _line(img, p0, p1)
    return img


def _line(img, p0, p1):
    n = int(max(abs(int(p1[0]) - int(p0[0])), abs(int(p1[1]) - int(p0[1]))) + 1)
    xs = np.linspace(p0[0], p1[0], n).astype(int)
    ys = np.linspace(p0[1], p1[1], n).astype(int)
    img[ys, xs] = (0, 0, 0)


def flow2fig(flow: np.ndarray, grid_size: int = 32, img_size: int = 256) -> np.ndarray:
    """Normalized sampling grid -> flow color image (misc.py:68-77): visualize
    the displacement from the identity grid."""
    h = flow.shape[0]
    ident = np.stack(np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, h),
                                 indexing="xy"), axis=-1)
    disp = flow - ident
    img = flow_to_color(disp)
    if img_size != h:
        import cv2
        img = cv2.resize(img, (img_size, img_size), interpolation=cv2.INTER_NEAREST)
    return img


def conf2fig(conf: np.ndarray, img_size: int = 256) -> np.ndarray:
    """Occlusion/confidence map -> grayscale image (misc.py:79-84)."""
    img = (np.clip(conf.squeeze(), 0, 1) * 255).astype(np.uint8)
    img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[0] != img_size:
        import cv2
        img = cv2.resize(img, (img_size, img_size), interpolation=cv2.INTER_NEAREST)
    return img


def save_snapshot_grid(path: str, panels: "dict[str, np.ndarray]") -> None:
    """Write training-monitor panels as one PNG grid (rows = panels, cols =
    frames) — the PNG equivalent of the reference's GIF grids
    (train...6D.py:354-446). Each panel: (T, H, W, 3) float [0,1] or uint8."""
    from PIL import Image

    rows = []
    for name, frames in panels.items():
        fr = np.asarray(frames)
        if fr.dtype != np.uint8:
            fr = (np.clip(fr, 0.0, 1.0) * 255).astype(np.uint8)
        rows.append(np.concatenate(list(fr), axis=1))       # (H, T*W, 3)
    h = max(r.shape[0] for r in rows)
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, h - r.shape[0]), (0, w - r.shape[1]), (0, 0)))
            for r in rows]
    Image.fromarray(np.concatenate(rows, axis=0)).save(path)


def get_grid(batchsize: int, size, minval: float = -1.0, maxval: float = 1.0):
    """2D coordinate grid (B, H, W, 2) with channels (x, y) in
    [minval, maxval] (misc.py:140-170, channels-last)."""
    rows, cols = size
    x = np.linspace(minval, maxval, cols, dtype=np.float32)
    y = np.linspace(minval, maxval, rows, dtype=np.float32)
    gx, gy = np.meshgrid(x, y)
    grid = np.stack([gx, gy], axis=-1)[None]
    return np.broadcast_to(grid, (batchsize, rows, cols, 2))


def resample(image, flow):
    """Warp image by a pixel-displacement flow (misc.py:116-138).

    image: (B, H, W, C); flow: (B, H, W, 2) pixel offsets (x, y). Uses
    align_corners=True + border padding like the reference helper.
    """
    import jax.numpy as jnp
    from dawn_tpu.ops.resample import grid_sample

    b, h, w, _ = image.shape
    norm = jnp.asarray([(w - 1.0) / 2.0, (h - 1.0) / 2.0], image.dtype)
    grid = jnp.asarray(get_grid(b, (h, w))) + flow / norm
    return grid_sample(image, grid, align_corners=True, padding_mode="border")
