"""Torch-free checkpoint loading (dawn_tpu.weights.pth_reader).

Proves the TPU image needs no torch at inference: checkpoints are written by
real ``torch.save`` (the exact artifact format of the released DAWN_*.pth /
LFG_*.pth / PBnet .pth.tar files, SURVEY.md section 2.7), then loaded with
``import torch`` BLOCKED and compared bitwise.
"""

import importlib
import os
import pickle
import sys
import zipfile
from contextlib import contextmanager

import numpy as np
import pytest
import torch

from dawn_tpu.weights.pth_reader import load_pth

HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.join(HERE, "ref_shims"), "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)


@contextmanager
def torch_blocked():
    """Any `import torch` (or submodule) inside the block raises ImportError."""
    saved = {m: sys.modules[m] for m in list(sys.modules)
             if m == "torch" or m.startswith("torch.")}
    for m in saved:
        sys.modules[m] = None
    try:
        yield
    finally:
        sys.modules.update(saved)


def _save(tmp_path, obj, name="ckpt.pth"):
    p = tmp_path / name
    torch.save(obj, str(p))
    return str(p)


class TestPthReader:
    def test_dtypes_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        ref = {
            "f32": rng.randn(3, 4).astype(np.float32),
            "f64": rng.randn(2, 2),
            "f16": rng.randn(5).astype(np.float16),
            "i64": rng.randint(-5, 5, (4,)),
            "i32": rng.randint(-5, 5, (4,)).astype(np.int32),
            "u8": rng.randint(0, 255, (4,)).astype(np.uint8),
            "bool": np.array([True, False, True]),
        }
        path = _save(tmp_path, {k: torch.from_numpy(v) for k, v in ref.items()})
        with torch_blocked():
            got = load_pth(path)
        for k, v in ref.items():
            assert got[k].dtype == v.dtype, k
            np.testing.assert_array_equal(got[k], v, err_msg=k)

    def test_bfloat16(self, tmp_path):
        t = torch.arange(8, dtype=torch.float32).to(torch.bfloat16)
        expect = t.to(torch.float32).numpy()
        path = _save(tmp_path, {"x": t})
        with torch_blocked():
            got = load_pth(path)
        np.testing.assert_array_equal(np.asarray(got["x"], np.float32), expect)

    def test_noncontiguous_and_offset_views(self, tmp_path):
        """torch.save stores the WHOLE storage + (offset, size, stride);
        transposed / sliced views must rebuild to the right values."""
        base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
        obj = {
            "transposed": base.t(),            # stride-swapped view
            "sliced": base[1:3, 2:5],          # offset + non-trivial strides
            "strided": base[::2, ::3],
        }
        expect = {k: v.numpy() for k, v in obj.items()}
        path = _save(tmp_path, obj)
        with torch_blocked():
            got = load_pth(path)
        for k, v in expect.items():
            np.testing.assert_array_equal(got[k], v, err_msg=k)

    def test_nested_checkpoint_layout(self, tmp_path):
        """The DAWN_*.pth layout: dict of scalars + nested state_dicts."""
        lin = torch.nn.Linear(3, 5)
        w = lin.weight.detach().numpy().copy()
        b = lin.bias.detach().numpy().copy()
        ckpt = {"example": 12345,
                "diffusion": lin.state_dict(),
                "nested": {"lr": 2e-4, "steps": [1, 2, 3]}}
        path = _save(tmp_path, ckpt)
        with torch_blocked():
            got = load_pth(path)
        assert got["example"] == 12345
        assert got["nested"]["lr"] == 2e-4
        np.testing.assert_array_equal(got["diffusion"]["weight"], w)
        np.testing.assert_array_equal(got["diffusion"]["bias"], b)

    def test_refuses_arbitrary_globals(self, tmp_path):
        """Unlike torch.load(weights_only=False), code-bearing pickles are
        rejected, not executed."""

        class Evil:
            def __reduce__(self):
                return (print, ("pwned",))

        evil = tmp_path / "evil.pth"
        with zipfile.ZipFile(evil, "w") as zf:
            zf.writestr("archive/data.pkl", pickle.dumps(Evil()))
        with torch_blocked():
            with pytest.raises(pickle.UnpicklingError):
                load_pth(str(evil))

    def test_converter_runs_torch_free(self, tmp_path):
        """convert_dawn_checkpoint end-to-end from a real reference-shaped
        .pth with torch blocked (the SURVEY section-7 stage-1 no-torch
        reader promise); converted leaves match the torch-side weights."""
        from dawn_tpu.weights import convert_dawn_checkpoint

        mod = importlib.import_module(
            "DM_3.modules.video_flow_diffusion_multiGPU_v0_crema_plus_"
            "faceemb_ca_multi_test")
        net = mod.Unet3D(dim=16, cond_dim=1024 + 6 + 2, cond_aud=1024,
                         cond_pose=6, cond_eye=2, num_frames=4, channels=275,
                         out_grid_dim=2, out_conf_dim=1, dim_mults=(1, 2),
                         use_hubert_audio_cond=True, win_width=2)
        torch_sd = {f"denoise_fn.{k}": v for k, v in net.state_dict().items()}
        expect_tmlp = torch_sd["denoise_fn.time_mlp.1.weight"].numpy().T.copy()
        expect_qkv = (torch_sd["denoise_fn.downs.0.3.fn.fn.fn.to_qkv.weight"]
                      .numpy().T.copy())
        path = _save(tmp_path, {"example": 1, "diffusion": torch_sd},
                     "DAWN_tiny.pth")
        with torch_blocked():
            variables = convert_dawn_checkpoint(path, num_levels=2)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["time_mlp_1"]["kernel"]), expect_tmlp)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["down_0_temporal"]["attn"]["to_qkv"]
                       ["kernel"]), expect_qkv)
