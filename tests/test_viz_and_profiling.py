"""face_viz drawing paths, native rasterizer overlay, profiling utils."""

import numpy as np
import pytest

from dawn_tpu.pipeline import face_viz
from dawn_tpu.utils.profiling import LoadAnomalyMonitor, PhaseTimer, Timer


def _fake_face():
    """62-d 3DMM param with identity rotation + 68 synthetic landmarks."""
    param = np.zeros(62, np.float32)
    P = np.hstack([np.eye(3, dtype=np.float32) * 0.001,
                   np.array([[60.], [60.], [0.]], np.float32)])
    param[:12] = P.ravel()
    rng = np.random.RandomState(0)
    ver = np.stack([rng.uniform(40, 88, 68), rng.uniform(40, 88, 68),
                    rng.uniform(-5, 5, 68)]).astype(np.float32)
    return param, ver


class TestFaceViz:
    def test_calc_pose(self):
        param, _ = _fake_face()
        P, angles = face_viz.calc_pose(param)
        assert P.shape == (3, 4)
        assert all(abs(a) < 1e-3 for a in angles)

    def test_plot_pose_box_and_landmarks(self):
        param, ver = _fake_face()
        img = np.zeros((128, 128, 3), np.uint8)
        P, _ = face_viz.calc_pose(param)
        out = face_viz.plot_pose_box(img.copy(), P, ver)
        assert out.sum() > 0          # something was drawn
        out2 = face_viz.draw_landmarks(img.copy(), ver)
        assert out2.sum() > 0

    def test_viz_pose(self, tmp_path):
        param, ver = _fake_face()
        img = np.zeros((128, 128, 3), np.uint8)
        wfp = str(tmp_path / "pose.png")
        face_viz.viz_pose(img, [param], [ver], wfp=wfp)
        import os
        assert os.path.exists(wfp)

    def test_render_depth(self):
        _, ver = _fake_face()
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        depth = face_viz.render_depth(ver, tris, 128, 128)
        assert depth.shape == (128, 128)
        assert depth.max() <= 1.0 and depth.min() >= 0.0
        assert (depth > 0).any()

    def test_render_depth_barycentric(self, monkeypatch):
        """Per-pixel INTERPOLATED z (not a per-triangle constant), pixels
        outside the triangle untouched, and native == numpy fallback up to
        f32-vs-f64 edge-pixel rounding."""
        from dawn_tpu.runtime import native as nat
        verts = np.array([[2, 2, 0.0], [12, 2, 1.0], [2, 12, 2.0]],
                         np.float32)   # (N, 3); z spans the triangle
        tris = np.array([[0, 1, 2]], np.int32)
        d = face_viz.render_depth(verts.T, tris, 16, 16)
        assert d[15, 15] == 0.0                   # bbox corner NOT stamped
        assert 0 < d[3, 3] < d[3, 8]              # z grows toward vertex 1
        assert d[3, 3] < d[10, 3]                 # ...and toward vertex 2
        if nat.load() is not None:
            monkeypatch.setattr(nat, "load", lambda *a, **k: None)
            d2 = face_viz.render_depth(verts.T, tris, 16, 16)
            both = (d > 0) & (d2 > 0)
            assert np.abs(d - d2)[both].max() < 1e-5
            assert ((d > 0) != (d2 > 0)).sum() <= 4   # edge-pixel rounding

    def test_render_mesh_overlay_native(self):
        from dawn_tpu.runtime import native
        if native.load() is None:
            pytest.skip("libdawn_rt.so not built")
        _, ver = _fake_face()
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        img = np.full((128, 128, 3), 128, np.uint8)
        out = face_viz.render_mesh_overlay(img, ver, tris)
        assert out.shape == img.shape and out.dtype == np.uint8


class TestProfiling:
    def test_timer(self):
        t = Timer()
        t.tic()
        avg = t.toc()
        assert avg >= 0 and t.calls == 1

    def test_phase_timer(self, capsys):
        pt = PhaseTimer(verbose=True)
        with pt.phase("ddim"):
            pass
        with pt.phase("ae"):
            pass
        out = capsys.readouterr().out
        assert "ddim time" in out
        assert "ddim" in pt.summary()

    def test_load_anomaly(self, capsys):
        m = LoadAnomalyMonitor(threshold_s=0.0)
        m.reset()
        assert m.check(3) is not None
        assert "unnormal load" in capsys.readouterr().out
        assert m.anomalies == 1
