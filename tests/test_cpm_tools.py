"""CPM-size measurement + img2hdf5 converter."""
import os

import numpy as np


class TestCpmSize:
    def test_sizes_ordering_and_ply(self, tmp_path):
        from heal_tpu.utils.cpm_size import (avg_cpm_kb, cpm_size_bytes,
                                             save_ply)

        rng = np.random.default_rng(0)
        coords = rng.uniform(-100, 100, (128, 3)).astype(np.float32)
        feats = rng.normal(0, 1, (128, 32)).astype(np.float32)
        s = cpm_size_bytes(coords, feats)
        assert s["raw"] == (128 * 3 + 128 * 32) * 4
        assert s["quantized"] < s["raw"]
        assert 0 < s["compressed"] <= s["quantized"] * 1.1

        p = save_ply(str(tmp_path / "kp.ply"), coords, feats)
        head = open(p).read(4096)
        assert head.startswith("ply")
        assert "element vertex 128" in head
        assert "property float feat31" in head

        assert avg_cpm_kb([s, s]) == s["compressed"] / 1024.0

    def test_constant_features_compress_well(self):
        from heal_tpu.utils.cpm_size import cpm_size_bytes

        coords = np.zeros((256, 3), np.float32)
        feats = np.ones((256, 16), np.float32)
        s = cpm_size_bytes(coords, feats)
        assert s["compressed"] < s["quantized"] / 10


class TestImg2Hdf5:
    def test_convert_tree_roundtrip(self, tmp_path):
        import h5py
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from heal_tpu.tools.img2hdf5 import convert_tree

        cdir = tmp_path / "scenario_0" / "641"
        cdir.mkdir(parents=True)
        rng = np.random.default_rng(1)
        imgs = {}
        for ts in ("000068", "000070"):
            for i in range(2):
                img = rng.integers(0, 255, (32, 48, 3), np.uint8)
                imgs[(ts, i)] = img
                plt.imsave(str(cdir / f"{ts}_camera{i}.png"), img)

        n = convert_tree(str(tmp_path))
        assert n == 2
        for ts in ("000068", "000070"):
            with h5py.File(str(cdir / f"{ts}_imgs.hdf5"), "r") as f:
                for i in range(2):
                    got = np.asarray(f[f"camera{i}"])
                    assert got.shape == (32, 48, 3)
                    np.testing.assert_array_equal(got, imgs[(ts, i)])

        # idempotent: second run writes nothing
        assert convert_tree(str(tmp_path)) == 0

    def test_rm_png(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from heal_tpu.tools.img2hdf5 import convert_cav_dir

        cdir = tmp_path / "cav"
        cdir.mkdir()
        img = np.zeros((8, 8, 3), np.uint8)
        plt.imsave(str(cdir / "000001_camera0.png"), img)
        assert convert_cav_dir(str(cdir), rm_png=True) == 1
        assert not (cdir / "000001_camera0.png").exists()
        assert (cdir / "000001_imgs.hdf5").exists()


class TestCheckpointRename:
    def test_rename_modules_roundtrip(self, tmp_path):
        """merge.rename_modules (ref heal_tools.rename_to_new_version):
        top-level module subtrees renamed in place, backup kept."""
        import numpy as np

        from heal_tpu.tools import checkpoint as ck
        from heal_tpu.tools.merge import rename_modules

        state = {
            "params": {
                "old_name": {"kernel": np.ones((2, 2), np.float32)},
                "keep": {"bias": np.zeros(3, np.float32)},
            },
            "batch_stats": {"old_name": {"mean": np.zeros(2, np.float32)}},
        }
        path = ck.save_checkpoint(str(tmp_path), state, 3)
        rename_modules(path, {"old_name": "new_name"})
        out = ck.load_checkpoint(path)
        assert "new_name" in out["params"] and "old_name" not in out["params"]
        assert "new_name" in out["batch_stats"]
        assert "keep" in out["params"]
        np.testing.assert_array_equal(
            out["params"]["new_name"]["kernel"], np.ones((2, 2))
        )
        import os

        assert os.path.exists(path + ".oldversion")
