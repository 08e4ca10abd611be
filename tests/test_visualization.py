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
