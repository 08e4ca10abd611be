"""Sparse 3D conv vs dense reference on tiny grids."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def sparse_scene():
    import jax.numpy as jnp

    from heal_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(0)
    lidar_range = [0, 0, 0, 1.6, 1.6, 0.8]  # grid 8 x 8 x 4 at 0.2
    voxel = [0.2, 0.2, 0.2]
    n = 300
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 1.6, n)
    pts[:, 1] = rng.uniform(0, 1.6, n)
    pts[:, 2] = rng.uniform(0, 0.8, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    mask = np.ones(n, bool)
    mask[250:] = False
    sp = sc.voxelize_points(
        jnp.asarray(pts), jnp.asarray(mask), lidar_range, voxel, 128
    )
    return sp, pts, mask


def dense_from_sparse(sp, feats):
    d, h, w = sp["grid"]
    coords = np.asarray(sp["coords"])
    valid = np.asarray(sp["valid"])
    c = feats.shape[-1]
    dense = np.zeros((d, h, w, c), np.float32)
    dense[coords[valid, 0], coords[valid, 1], coords[valid, 2]] = np.asarray(
        feats
    )[valid]
    return dense


def dense_conv3d(dense, weights, stride=1):
    """Reference dense 3D conv (27, Cin, Cout), padding 1."""
    import jax.numpy as jnp
    from jax import lax

    k = np.zeros((3, 3, 3, weights.shape[1], weights.shape[2]), np.float32)
    i = 0
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                # out[o] += W_i * in[o + delta] -> kernel tap at (1+dz,...)
                k[1 + dz, 1 + dy, 1 + dx] = np.asarray(weights[i])
                i += 1
    # correlation with flipped? lax conv computes correlation: out[o] =
    # sum_t k[t] * in[o*s + t - p]; we need in[o + delta] at t = delta + 1
    out = lax.conv_general_dilated(
        jnp.asarray(dense[None].transpose(0, 4, 1, 2, 3)),
        jnp.asarray(k.transpose(4, 3, 0, 1, 2)),
        window_strides=(stride,) * 3,
        padding=[(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return np.asarray(out[0].transpose(1, 2, 3, 0))


class TestVoxelize:
    def test_mean_features(self, sparse_scene):
        sp, pts, mask = sparse_scene
        valid = np.asarray(sp["valid"])
        coords = np.asarray(sp["coords"])
        feats = np.asarray(sp["feats"])
        assert valid.sum() > 10
        # pick a voxel and verify its mean
        vi = np.argmax(valid)
        z, y, x = coords[vi]
        sel = (
            mask
            & (np.floor(pts[:, 0] / 0.2).astype(int) == x)
            & (np.floor(pts[:, 1] / 0.2).astype(int) == y)
            & (np.floor(pts[:, 2] / 0.2).astype(int) == z)
        )
        np.testing.assert_allclose(
            feats[vi], pts[sel].mean(axis=0), rtol=1e-5
        )
        # keys sorted with INVALID padding at the end
        keys = np.asarray(sp["keys"])
        assert (np.diff(keys.astype(np.int64)) >= 0).all()

    def test_masked_points_excluded(self, sparse_scene):
        import jax.numpy as jnp

        from heal_tpu.ops import sparse_conv as sc

        sp, pts, mask = sparse_scene
        pts2 = pts.copy()
        pts2[250:] = 99.0  # garbage in masked region
        sp2 = sc.voxelize_points(
            jnp.asarray(pts2), jnp.asarray(mask),
            [0, 0, 0, 1.6, 1.6, 0.8], [0.2, 0.2, 0.2], 128,
        )
        np.testing.assert_allclose(
            np.asarray(sp["feats"]), np.asarray(sp2["feats"]), atol=1e-6
        )


class TestSubMConv:
    def test_matches_dense_at_active_sites(self, sparse_scene):
        import jax.numpy as jnp

        from heal_tpu.ops import sparse_conv as sc

        sp, _, _ = sparse_scene
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(0, 0.5, (27, 4, 6)).astype(np.float32))
        out = np.asarray(sc.subm_conv(sp, w))
        dense = dense_from_sparse(sp, sp["feats"])
        ref = dense_conv3d(dense, w)
        coords = np.asarray(sp["coords"])
        valid = np.asarray(sp["valid"])
        got = out[valid]
        want = ref[coords[valid, 0], coords[valid, 1], coords[valid, 2]]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestStridedConv:
    def test_matches_dense_strided(self, sparse_scene):
        import jax.numpy as jnp

        from heal_tpu.ops import sparse_conv as sc

        sp, _, _ = sparse_scene
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(0, 0.5, (27, 4, 5)).astype(np.float32))
        sites = sc.downsample_sites(sp, 128)
        out = np.asarray(sc.strided_conv(sp, sites, w))
        dense = dense_from_sparse(sp, sp["feats"])
        ref = dense_conv3d(dense, w, stride=2)
        coords = np.asarray(sites["coords"])
        valid = np.asarray(sites["valid"])
        assert sites["grid"] == tuple(ref.shape[:3])
        got = out[valid]
        want = ref[coords[valid, 0], coords[valid, 1], coords[valid, 2]]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        # dense must be ~zero at sites not generated
        gen = np.zeros(ref.shape[:3], bool)
        gen[coords[valid, 0], coords[valid, 1], coords[valid, 2]] = True
        if (~gen).any():
            assert np.abs(ref[~gen]).max() < 1e-5


class TestColumnEngine:
    """ops/column_conv.py must agree with ops/sparse_conv.py exactly
    (same weights, same active-site sets) — the SECOND model runs on the
    column engine; the voxel engine is the verified-against-dense oracle."""

    def _both(self, pts, mask):
        """Voxel + column structures with generous (non-truncating) caps;
        the shared fixture's 128-voxel cap drops sites the column engine
        keeps, which is exactly the asymmetry these tests must not hide."""
        import jax.numpy as jnp

        from heal_tpu.ops import column_conv as col
        from heal_tpu.ops import sparse_conv as sc

        sp = sc.voxelize_points(
            jnp.asarray(pts), jnp.asarray(mask),
            [0, 0, 0, 1.6, 1.6, 0.8], [0.2, 0.2, 0.2], 256,
        )
        cols = col.voxelize_columns(
            jnp.asarray(pts), jnp.asarray(mask),
            [0, 0, 0, 1.6, 1.6, 0.8], [0.2, 0.2, 0.2], 96,
        )
        return sp, cols

    def _dense_cols(self, cols, feats, cdims):
        d, h, w = cols["grid"]
        c = feats.shape[-1]
        dense = np.zeros((d, h, w, c), np.float32)
        ck = np.asarray(cols["ckeys"])
        occ = np.asarray(cols["occ"])
        for i in np.where(np.asarray(cols["cvalid"]))[0]:
            y, x = ck[i] // w, ck[i] % w
            for z in np.where(occ[i])[0]:
                dense[z, y, x] = np.asarray(feats)[i, z]
        return dense

    def test_voxelize_and_subm_match_voxel_engine(self, sparse_scene):
        import jax.numpy as jnp

        from heal_tpu.ops import sparse_conv as sc

        _, pts, mask = sparse_scene
        sp, cols = self._both(pts, mask)
        assert np.asarray(cols["occ"]).sum() == np.asarray(
            sp["valid"]
        ).sum()
        dense_sp = dense_from_sparse(sp, sp["feats"])
        dense_cc = self._dense_cols(cols, cols["feats"], 4)
        np.testing.assert_allclose(dense_cc, dense_sp, atol=1e-6)

        rng = np.random.default_rng(7)
        w = jnp.asarray(rng.normal(0, 0.5, (27, 4, 6)).astype(np.float32))
        from heal_tpu.ops import column_conv as col

        o_sp = dense_from_sparse(sp, sc.subm_conv(sp, w))
        o_cc = self._dense_cols(cols, col.subm_conv(cols, w), 6)
        np.testing.assert_allclose(o_cc, o_sp, rtol=1e-4, atol=1e-5)

    def test_strided_matches_voxel_engine(self, sparse_scene):
        import jax.numpy as jnp

        from heal_tpu.ops import column_conv as col
        from heal_tpu.ops import sparse_conv as sc

        _, pts, mask = sparse_scene
        sp, cols = self._both(pts, mask)
        rng = np.random.default_rng(8)
        w = jnp.asarray(rng.normal(0, 0.5, (27, 4, 5)).astype(np.float32))
        sites = sc.downsample_sites(sp, 256)
        o_sp = sc.strided_conv(sp, sites, w)
        out_cols = col.downsample_columns(cols, 96)
        cols2 = col.strided_conv(cols, out_cols, w)
        assert cols2["grid"] == sites["grid"]
        # identical active-voxel sets
        d2, h2, w2 = sites["grid"]
        cs = np.asarray(sites["coords"])[np.asarray(sites["valid"])]
        sset = {tuple(r) for r in cs}
        ck = np.asarray(cols2["ckeys"])
        occ2 = np.asarray(cols2["occ"])
        cset = {
            (z, ck[i] // w2, ck[i] % w2)
            for i in np.where(np.asarray(cols2["cvalid"]))[0]
            for z in np.where(occ2[i])[0]
        }
        assert sset == cset
        dn_sp = np.zeros((d2, h2, w2, 5), np.float32)
        dn_sp[cs[:, 0], cs[:, 1], cs[:, 2]] = np.asarray(o_sp)[
            np.asarray(sites["valid"])
        ]
        dn_cc = self._dense_cols(cols2, cols2["feats"], 5)
        np.testing.assert_allclose(dn_cc, dn_sp, rtol=1e-4, atol=1e-5)
        # BEV fold parity
        bev_sp = np.asarray(sc.to_dense_bev(sites, o_sp))
        bev_cc = np.asarray(col.to_dense_bev(cols2))
        np.testing.assert_allclose(bev_cc, bev_sp, rtol=1e-4, atol=1e-5)


class TestSecondEncoder:
    @pytest.mark.slow
    def test_forward_shape(self):
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.second import SecondEncoder

        rng = np.random.default_rng(3)
        pts = np.zeros((2, 500, 4), np.float32)
        pts[..., 0] = rng.uniform(-3.2, 3.2, (2, 500))
        pts[..., 1] = rng.uniform(-3.2, 3.2, (2, 500))
        pts[..., 2] = rng.uniform(-1, 1, (2, 500))
        mask = np.ones((2, 500), bool)
        enc = SecondEncoder(
            voxel_size=(0.1, 0.1, 0.25),
            lidar_range=(-3.2, -3.2, -1, 3.2, 3.2, 1),
            channels=(8, 16, 16, 16),
            max_voxels=(2000, 1500, 1000, 800),
        )
        v = enc.init(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask)
        )
        out = enc.apply(v, jnp.asarray(pts), jnp.asarray(mask))
        # grid 64x64x8 -> 8x8x1 after 3 stride-2 stages; z folds to channels
        assert out.shape == (2, 8, 8, 16)
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out)).max() > 0


class TestPresortedVoxelize:
    def test_presorted_matches_unsorted(self):
        """voxelize_columns(presorted=True) on host-ordered points ==
        the argsort path on the same (shuffled) points."""
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.ops import column_conv as cc

        rng = np.random.RandomState(0)
        n = 4000
        lidar = [-8.0, -4.0, -3.0, 8.0, 4.0, 1.0]
        vs = [0.2, 0.2, 0.2]
        pts = np.stack([
            rng.uniform(-9, 9, n), rng.uniform(-5, 5, n),
            rng.uniform(-3.5, 1.5, n), rng.rand(n),
        ], -1).astype(np.float32)
        mask = rng.rand(n) > 0.1
        # host order by the full voxel key (scene._presort_voxel logic)
        nx, ny, nz = 80, 40, 20
        xi = np.floor((pts[:, 0] + 8) / 0.2).astype(np.int64)
        yi = np.floor((pts[:, 1] + 4) / 0.2).astype(np.int64)
        zi = np.floor((pts[:, 2] + 3) / 0.2).astype(np.int64)
        ok = mask & (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny) \
            & (zi >= 0) & (zi < nz)
        key = np.where(ok, (yi * nx + xi) * nz + zi, np.int64(2**31 - 1))
        order = np.argsort(key, kind="stable")

        a = cc.voxelize_columns(
            jnp.asarray(pts[order]), jnp.asarray(mask[order]), lidar, vs,
            1024, presorted=True,
        )
        b = cc.voxelize_columns(
            jnp.asarray(pts), jnp.asarray(mask), lidar, vs, 1024,
        )
        for k in ("ckeys", "cvalid", "occ"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        np.testing.assert_allclose(
            np.asarray(a["feats"]), np.asarray(b["feats"]), atol=1e-5
        )


class TestBf16SplitFirstConv:
    def test_bf16_split_tracks_f32(self):
        """bf16 serving of SecondEncoder (local-offset + f32-center split
        first conv) tracks the f32 forward."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.models.second import SecondEncoder

        rng = np.random.RandomState(1)
        n = 3000
        lidar = [-80.0, -40.0, -3.0, 80.0, 40.0, 1.0]
        pts = np.stack([
            rng.uniform(-79, 79, n), rng.uniform(-39, 39, n),
            rng.uniform(-2.9, 0.9, n), rng.rand(n),
        ], -1).astype(np.float32)
        enc = SecondEncoder(
            voxel_size=(0.1, 0.1, 0.1), lidar_range=lidar,
            max_voxels=(4096, 4096, 2048, 1024),
        )
        jp = jnp.asarray(pts)[None]
        jm = jnp.ones((1, n), bool)
        v = enc.init(jax.random.PRNGKey(0), jp, jm, train=False)
        out32 = enc.apply(v, jp, jm, train=False)

        v16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, v)
        out16 = enc.apply(v16, jp, jm, train=False).astype(jnp.float32)
        ref = np.asarray(out32)
        got = np.asarray(out16)
        # bf16 activations: expect agreement at bf16 resolution relative
        # to the activation scale
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() < 0.05 * max(scale, 1.0), (
            np.abs(got - ref).max(), scale)


class TestDenseTail:
    def test_dense_tail_matches_sparse_tail(self):
        """SecondEncoder dense-tail (last level's subm convs on the
        dense canvas) == the sparse tail with the same params."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.models.second import SecondEncoder

        rng = np.random.RandomState(2)
        n = 2500
        lidar = [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0]
        pts = np.stack([
            rng.uniform(-15.5, 15.5, n), rng.uniform(-7.5, 7.5, n),
            rng.uniform(-2.9, 0.9, n), rng.rand(n),
        ], -1).astype(np.float32)
        kw = dict(
            voxel_size=(0.1, 0.1, 0.1), lidar_range=lidar,
            max_voxels=(3000, 2000, 1200, 800),
        )
        dense = SecondEncoder(dense_tail=True, **kw)
        sparse = SecondEncoder(dense_tail=False, **kw)
        jp = jnp.asarray(pts)[None]
        jm = jnp.ones((1, n), bool)
        v = dense.init(jax.random.PRNGKey(0), jp, jm, train=False)
        out_d = dense.apply(v, jp, jm, train=False)
        out_s = sparse.apply(v, jp, jm, train=False)  # same params
        np.testing.assert_allclose(
            np.asarray(out_d), np.asarray(out_s), atol=2e-4
        )
        assert np.abs(np.asarray(out_s)).max() > 0
