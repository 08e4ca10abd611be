"""Canvas rasterizers + feature-space analysis metrics."""
import numpy as np


class TestCanvasBEV:
    def test_points_and_boxes_rasterize(self, tmp_path):
        from heal_tpu.visualization.canvas import CanvasBEV, save_canvas

        cv = CanvasBEV(canvas_shape=(100, 200),
                       canvas_range=(-10, -5, 10, 5))
        pts = np.array([[0.0, 0.0], [9.9, 4.9], [-9.9, -4.9], [50.0, 0.0]])
        cv.draw_canvas_points(pts, radius=1, colors=(255, 0, 0))
        assert (cv.get_canvas()[:, :, 0] == 255).sum() >= 3  # 3 in range
        # center point lands mid-canvas
        assert cv.get_canvas()[50, 99, 0] == 255 or cv.get_canvas()[49, 100, 0] == 255

        corners = np.array([[[2.0, 1.0], [4.0, 1.0], [4.0, 2.0], [2.0, 2.0]]])
        before = (cv.get_canvas()[:, :, 1] == 255).sum()
        cv.draw_boxes(corners, colors=(0, 255, 0))
        assert (cv.get_canvas()[:, :, 1] == 255).sum() > before

        p = tmp_path / "bev.png"
        save_canvas(cv.get_canvas(), str(p))
        assert p.exists() and p.stat().st_size > 0

    def test_out_of_range_points_dropped(self):
        from heal_tpu.visualization.canvas import CanvasBEV

        cv = CanvasBEV(canvas_shape=(50, 50), canvas_range=(-1, -1, 1, 1))
        cv.draw_canvas_points(np.array([[100.0, 100.0]]), colors=(9, 9, 9))
        assert (cv.get_canvas() > 0).sum() == 0


class TestCanvas3D:
    def test_projection_and_depth_order(self):
        from heal_tpu.visualization.canvas import Canvas3D

        cv = Canvas3D(canvas_shape=(100, 100),
                      camera_center=(-10.0, 0.0, 5.0),
                      target=(10.0, 0.0, 0.0))
        # near point should overwrite far point projected to same pixel
        far = np.array([[30.0, 0.0, 0.0]])
        near = np.array([[5.0, 0.0, 1.0]])
        cv.draw_canvas_points(np.concatenate([far, near]), radius=2,
                              colors=np.array([[255, 0, 0], [0, 255, 0]]))
        c = cv.get_canvas()
        assert (c[:, :, 1] == 255).any()

    def test_box_wireframe_draws(self):
        from heal_tpu.utils import box_np
        from heal_tpu.visualization.canvas import Canvas3D

        cv = Canvas3D()
        box = np.array([[10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
        corners = box_np.boxes_to_corners_3d(box, order="lwh")
        cv.draw_boxes(corners, colors=(0, 0, 255))
        assert (cv.get_canvas()[:, :, 2] == 255).sum() > 20

    def test_behind_camera_invisible(self):
        from heal_tpu.visualization.canvas import Canvas3D

        cv = Canvas3D(camera_center=(0.0, 0.0, 2.0), target=(10.0, 0.0, 0.0))
        cv.draw_canvas_points(np.array([[-50.0, 0.0, 0.0]]), radius=3,
                              colors=(7, 7, 7))
        assert (cv.get_canvas() > 0).sum() == 0


class TestFeatureAnalysis:
    def test_cka_identity_and_invariance(self):
        from heal_tpu.visualization.feature_analysis import (
            kernel_cka, linear_cka)

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (64, 16))
        assert abs(linear_cka(x, x) - 1.0) < 1e-6
        # CKA is invariant to orthogonal transforms + scaling
        q, _ = np.linalg.qr(rng.normal(0, 1, (16, 16)))
        assert abs(linear_cka(x, 3.0 * x @ q) - 1.0) < 1e-6
        y = rng.normal(0, 1, (64, 16))
        assert linear_cka(x, y) < 0.5
        assert 0.0 < kernel_cka(x, y) <= 1.0

    def test_mmd_zero_for_same_distribution(self):
        from heal_tpu.visualization.feature_analysis import mmd_linear, mmd_rbf

        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (256, 8))
        y = rng.normal(0, 1, (256, 8))
        z = rng.normal(4, 1, (256, 8))
        assert mmd_linear(x, y) < mmd_linear(x, z)
        assert mmd_rbf(x, y, gamma=0.5) < mmd_rbf(x, z, gamma=0.5)

    def test_tsne_embed_and_scatter(self, tmp_path):
        from heal_tpu.visualization.feature_analysis import (
            scatter_by_label, tsne_embed)

        rng = np.random.default_rng(2)
        feats = np.concatenate(
            [rng.normal(0, 1, (20, 8)), rng.normal(6, 1, (20, 8))]
        )
        emb = tsne_embed(feats, perplexity=5.0)
        assert emb.shape == (40, 2)
        labels = np.array(["m1"] * 20 + ["m2"] * 20)
        p = tmp_path / "tsne.png"
        scatter_by_label(emb, labels, str(p), title="t-SNE")
        assert p.exists() and p.stat().st_size > 0

    def test_pairwise_l2(self):
        from heal_tpu.visualization.feature_analysis import pairwise_l2

        x = np.array([[0.0, 0.0], [3.0, 4.0]])
        d = pairwise_l2(x, x)
        assert abs(d[0, 1] - 5.0) < 1e-9 and d[0, 0] < 1e-9


class TestViewer3D:
    """Interactive 3D viewer (viewer3d.py): headless canvas fallback +
    open3d geometry construction against a stub module."""

    def _scene(self):
        from heal_tpu.visualization.viewer3d import Scene3D

        rng = np.random.default_rng(3)
        pts = np.concatenate(
            [rng.uniform(-30, 30, (500, 3)), rng.uniform(0, 1, (500, 1))],
            axis=1,
        )
        boxes = np.array(
            [[5.0, 0.0, 0.0, 1.56, 1.6, 3.9, 0.3],
             [15.0, 5.0, 0.0, 1.56, 1.6, 3.9, -0.4]]
        )
        return (
            Scene3D()
            .add_points(pts, mode="intensity")
            .add_boxes(boxes, color=(1, 0, 0), order="hwl")
        ), pts, boxes

    def test_headless_render_draws_content(self):
        scene, _, _ = self._scene()
        img = scene.render(canvas_shape=(240, 320))
        assert img.shape == (240, 320, 3) and img.dtype == np.uint8
        assert img.any(), "render produced an empty canvas"

    def test_show_canvas_backend_saves_png(self, tmp_path, monkeypatch):
        import heal_tpu.visualization.viewer3d as v3d

        monkeypatch.setattr(v3d, "_open3d", lambda: None)
        p = tmp_path / "scene.png"
        img = v3d.visualize_single_sample_output_gt(
            np.array([[5.0, 0.0, 0.0, 1.56, 1.6, 3.9, 0.3]]),
            np.array([[5.2, 0.1, 0.0, 1.56, 1.6, 3.9, 0.3]]),
            np.random.default_rng(0).uniform(-20, 20, (100, 4)),
            show_vis=False,
            save_path=str(p),
        )
        assert p.exists() and p.stat().st_size > 0
        assert img is not None and img.any()

    def test_color_encoding_modes(self):
        from heal_tpu.visualization.viewer3d import color_encoding

        v = np.linspace(0, 1, 9)
        for mode in ("intensity", "z-value", "constant"):
            c = color_encoding(v, mode)
            assert c.shape == (9, 3)
            assert (c >= 0).all() and (c <= 1).all()
        # intensity ramp is monotone in brightness
        c = color_encoding(v, "intensity")
        assert (np.diff(c.sum(axis=1)) >= 0).all()

    def test_open3d_geometry_construction_via_stub(self, monkeypatch):
        """A stub open3d module records geometry; asserts the viewer
        emits one point cloud + one lineset per box with the left->
        right-hand x flip (reference vis_utils.py:60-63)."""
        import sys
        import types

        created = {"pc": [], "ls": []}

        class _Vec:
            def __init__(self, data):
                self.data = np.asarray(data)

        class _PointCloud:
            def __init__(self):
                created["pc"].append(self)

        class _LineSet:
            def __init__(self):
                created["ls"].append(self)

        stub = types.ModuleType("open3d")
        stub.geometry = types.SimpleNamespace(
            PointCloud=_PointCloud, LineSet=_LineSet
        )
        stub.utility = types.SimpleNamespace(
            Vector3dVector=_Vec, Vector2iVector=_Vec
        )
        monkeypatch.setitem(sys.modules, "open3d", stub)

        scene, pts, boxes = self._scene()
        geoms = scene.to_open3d()
        assert len(created["pc"]) == 1 and len(created["ls"]) == 2
        assert len(geoms) == 3
        # x flipped, yz intact
        np.testing.assert_allclose(
            geoms[0].points.data[:, 0], -pts[:, 0], rtol=1e-6
        )
        np.testing.assert_allclose(
            geoms[0].points.data[:, 1:], pts[:, 1:3], rtol=1e-6
        )
        # each lineset has the 12 box edges
        assert geoms[1].lines.data.shape == (12, 2)

    def test_sequence_headless_writes_frames(self, tmp_path, monkeypatch):
        import heal_tpu.visualization.viewer3d as v3d

        monkeypatch.setattr(v3d, "_open3d", lambda: None)
        frames = [
            {
                "points": np.random.default_rng(i).uniform(
                    -20, 20, (64, 4)
                ),
                "gt_boxes": np.array(
                    [[4.0 + i, 0.0, 0.0, 1.5, 1.6, 3.9, 0.0]]
                ),
            }
            for i in range(3)
        ]
        n = v3d.visualize_sequence(frames, save_dir=str(tmp_path))
        assert n == 3
        assert len(list(tmp_path.glob("frame_*.png"))) == 3
