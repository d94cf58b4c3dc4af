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


class TestPnccUv:
    """pncc / uv_tex visualization paths (reference utils/pncc.py, uv.py:
    Sim3DR rasterize == per-vertex-color z-buffered barycentric fill)."""

    def test_rasterize_colors_interpolates(self):
        # one triangle, pure R/G/B corners: center pixel ~ (1/3, 1/3, 1/3)
        verts = np.array([[2, 2, 0.0], [14, 2, 0.0], [2, 14, 0.0]],
                         np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        colors = np.eye(3, dtype=np.float32)
        bg = np.zeros((16, 16, 3), np.float32)
        out = face_viz.rasterize_colors(verts, tris, colors, bg)
        assert (out[15, 15] == 0).all()               # outside untouched
        center = out[5, 5]
        assert center.sum() > 0.95                     # inside: colors sum ~1
        assert np.all(center > 0.1)                    # ...all three blended
        near_v0 = out[3, 3]
        assert near_v0[0] > near_v0[1] and near_v0[0] > near_v0[2]

    def test_rasterize_colors_zbuffer(self):
        # two overlapping triangles: the nearer (larger z) one wins
        verts = np.array([[1, 1, 0.0], [14, 1, 0.0], [1, 14, 0.0],
                          [1, 1, 5.0], [14, 1, 5.0], [1, 14, 5.0]],
                         np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
        out = face_viz.rasterize_colors(verts, tris, colors,
                                        np.zeros((16, 16, 3), np.float32))
        assert out[4, 4, 1] > 0.99 and out[4, 4, 0] < 1e-6

    def test_native_matches_numpy(self, monkeypatch):
        from dawn_tpu.runtime import native as nat
        if nat.load() is None or not hasattr(nat.load(), "dawn_render_colors"):
            pytest.skip("native colors renderer unavailable")
        rng = np.random.RandomState(3)
        verts = np.column_stack([rng.uniform(0, 31, 12),
                                 rng.uniform(0, 31, 12),
                                 rng.uniform(0, 4, 12)]).astype(np.float32)
        tris = rng.randint(0, 12, (8, 3)).astype(np.int32)
        colors = rng.rand(12, 3).astype(np.float32)
        bg = rng.rand(32, 32, 3).astype(np.float32)
        a = face_viz.rasterize_colors(verts, tris, colors, bg)
        monkeypatch.setattr(nat, "load", lambda *a_, **k: None)
        b = face_viz.rasterize_colors(verts, tris, colors, bg)
        diff = np.abs(a - b).max(axis=-1)
        assert (diff > 1e-4).mean() < 0.02     # f32-vs-f64 edge rounding only

    def test_pncc_end_to_end(self):
        # NCC code from a fake mean shape; colors land inside the face bbox
        rng = np.random.RandomState(0)
        n = 30
        u = rng.randn(n * 3)
        ncc = face_viz.calc_ncc_code(u)
        assert ncc.shape == (n, 3)
        assert ncc.min() >= 0 and ncc.max() <= 1
        ver = np.stack([rng.uniform(20, 100, n), rng.uniform(20, 100, n),
                        rng.uniform(0, 10, n)])        # (3, N)
        tris = rng.randint(0, n, (40, 3)).astype(np.int32)
        img = np.zeros((128, 128, 3), np.uint8)
        out = face_viz.pncc(img, [ver], tris, ncc, with_bg_flag=False)
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert out[20:101, 20:101].any() and not out[:19].any()
        # with background: pixels outside the mesh keep the background
        img2 = np.full((128, 128, 3), 7, np.uint8)
        out2 = face_viz.pncc(img2, [ver], tris, ncc, with_bg_flag=True)
        assert (out2[0, 0] == 7).all()

    def test_uv_tex_roundtrip(self):
        # a flat quad textured by a gradient image: the UV map reproduces
        # the gradient (up to the v-flip process_uv applies)
        img = np.zeros((64, 64, 3), np.float32)
        img[..., 0] = np.linspace(0, 1, 64)[None, :]   # red ramps with x
        ver = np.array([[8, 56, 8, 56], [8, 8, 56, 56],
                        [0, 0, 0, 0]], np.float32)     # (3, 4) quad corners
        tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
        uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
        tex = face_viz.uv_tex(img, [ver], tris, uv, uv_h=32, uv_w=32)
        # red channel grows along u in UV space as it does along x in image
        assert tex[16, 25, 0] > tex[16, 6, 0] + 0.3
        assert tex.shape == (32, 32, 3)
