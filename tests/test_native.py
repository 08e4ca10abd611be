"""Native C++ loader core vs numpy reference."""
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native_lib():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from heal_tpu.native import build as nb

    nb.build(verbose=False)
    from heal_tpu import native

    assert native.available()
    return native


class TestNative:
    def test_bbox_overlaps_matches_numpy(self, native_lib):
        from heal_tpu.utils.box_np import standup_iou_matrix

        rng = np.random.default_rng(0)
        a = rng.uniform(0, 50, (100, 2))
        b = rng.uniform(1, 8, (100, 2))
        boxes = np.concatenate([a, a + b], 1).astype(np.float32)
        q = boxes[rng.permutation(100)][:40]
        got = native_lib.bbox_overlaps(boxes, q)
        want = standup_iou_matrix(boxes, q, plus_one=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pcd_roundtrip(self, native_lib, tmp_path):
        from heal_tpu.data.opv2v import _load_pcd_numpy, write_synthetic_opv2v_tree
        import os

        write_synthetic_opv2v_tree(str(tmp_path), 1, 1, 1)
        pcd = None
        for root, _, files in os.walk(tmp_path):
            for f in files:
                if f.endswith(".pcd"):
                    pcd = os.path.join(root, f)
        got = native_lib.read_pcd(pcd)
        want = _load_pcd_numpy(pcd)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pcd_rejects_missing_xyz(self, native_lib, tmp_path):
        p = tmp_path / "bad.pcd"
        p.write_text(
            "VERSION 0.7\nFIELDS a b\nSIZE 4 4\nTYPE F F\nCOUNT 1 1\n"
            "WIDTH 1\nHEIGHT 1\nPOINTS 1\nDATA ascii\n1.0 2.0\n"
        )
        with pytest.raises(IOError):
            native_lib.read_pcd(str(p))

    def test_pcd_non_float32_binary(self, native_lib, tmp_path):
        # DAIR-style layout: x/y/z float64 + intensity uint8
        import struct

        p = tmp_path / "mixed.pcd"
        pts = [(1.5, -2.25, 0.5, 7), (10.0, 20.0, -1.0, 255)]
        body = b"".join(
            struct.pack("<dddB", x, y, z, i) for x, y, z, i in pts
        )
        header = (
            "VERSION 0.7\nFIELDS x y z intensity\nSIZE 8 8 8 1\n"
            "TYPE F F F U\nCOUNT 1 1 1 1\nWIDTH 2\nHEIGHT 1\n"
            "POINTS 2\nDATA binary\n"
        )
        p.write_bytes(header.encode() + body)
        got = native_lib.read_pcd(str(p))
        np.testing.assert_allclose(
            got, [[1.5, -2.25, 0.5, 7], [10, 20, -1, 255]], atol=1e-6
        )

    def test_pcd_cap_growth(self, native_lib, tmp_path):
        from heal_tpu.data.opv2v import _load_pcd_numpy, write_synthetic_opv2v_tree
        import os

        write_synthetic_opv2v_tree(str(tmp_path), 1, 1, 1)
        pcd = None
        for root, _, files in os.walk(tmp_path):
            for f in files:
                if f.endswith(".pcd"):
                    pcd = os.path.join(root, f)
        want = _load_pcd_numpy(pcd)
        got = native_lib.read_pcd(pcd, cap=max(4, len(want) // 3))
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_voxelize_bounds(self, native_lib):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-5, 5, (3000, 4)).astype(np.float32)
        v, c, n = native_lib.voxelize(
            pts, [-5, -5, -5, 5, 5, 5], [0.5, 0.5, 0.5], 4000, 8
        )
        assert n.max() <= 8
        assert (c >= 0).all() and (c < 20).all()
        # points assigned to their voxel
        zi, yi, xi = c[0]
        p0 = v[0, : n[0]]
        assert (np.floor((p0[:, 0] + 5) / 0.5).astype(int) == xi).all()
        assert (np.floor((p0[:, 1] + 5) / 0.5).astype(int) == yi).all()

    def test_range_filter_pad(self, native_lib):
        pts = np.array(
            [[0, 0, 0, 1], [100, 0, 0, 1], [1, 1, 0.5, 0.3]], np.float32
        )
        out, mask = native_lib.range_filter_pad(
            pts, [-10, -10, -3, 10, 10, 1], 5
        )
        assert mask.sum() == 2
        np.testing.assert_allclose(out[1], [1, 1, 0.5, 0.3])
