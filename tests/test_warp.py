import numpy as np
import pytest


class TestAffineWarp:
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch_grid_sample(self, align_corners):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        import jax.numpy as jnp

        from heal_tpu.ops.warp import affine_warp

        rng = np.random.default_rng(0)
        h, w, c = 24, 40, 3
        src = rng.normal(size=(h, w, c)).astype(np.float32)
        theta = 0.3
        M = np.array(
            [
                [np.cos(theta), -np.sin(theta) * h / w, 0.1],
                [np.sin(theta) * w / h, np.cos(theta), -0.2],
            ],
            dtype=np.float32,
        )
        ours = np.asarray(affine_warp(jnp.asarray(src), jnp.asarray(M), align_corners))

        src_t = torch.from_numpy(src).permute(2, 0, 1)[None]  # (1, C, H, W)
        grid = F.affine_grid(
            torch.from_numpy(M)[None], [1, c, h, w], align_corners=align_corners
        )
        ref = F.grid_sample(src_t, grid, align_corners=align_corners)
        ref = ref[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_identity(self):
        import jax.numpy as jnp

        from heal_tpu.ops.warp import affine_warp

        src = np.random.default_rng(1).normal(size=(16, 16, 2)).astype(np.float32)
        M = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        out = np.asarray(affine_warp(jnp.asarray(src), M))
        np.testing.assert_allclose(out, src, atol=1e-6)

    def test_translation_shifts_content(self):
        import jax.numpy as jnp

        from heal_tpu.ops.warp import affine_warp

        h = w = 8
        src = np.zeros((h, w, 1), dtype=np.float32)
        src[4, 4] = 1.0
        # shift sampling by +2 pixels in x: out[y, x] = src[y, x+2]
        M = jnp.asarray([[1.0, 0, 2.0 * 2 / w], [0, 1.0, 0]])
        out = np.asarray(affine_warp(jnp.asarray(src), M))
        assert out[4, 2, 0] == pytest.approx(1.0)
        assert out[4, 4, 0] == pytest.approx(0.0)


class TestSkipEgo:
    def test_skip_ego_matches_identity_warp(self):
        import jax.numpy as jnp

        from heal_tpu.ops.warp import warp_agents_to_ego

        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(0, 1, (1, 3, 16, 24, 8)), jnp.float32)
        # slot 0 identity, others rotated
        aff = np.tile(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32),
                      (1, 3, 3, 1, 1))
        c, s = np.cos(0.3), np.sin(0.3)
        aff[0, 0, 1] = [[c, -s, 0.1], [s, c, 0.0]]
        aff[0, 0, 2] = [[c, s, 0.0], [-s, c, 0.1]]
        aff = jnp.asarray(aff)
        skip = warp_agents_to_ego(feats, aff, skip_ego=True, method="exact")
        full = warp_agents_to_ego(feats, aff, skip_ego=False, method="exact")
        np.testing.assert_allclose(
            np.asarray(skip), np.asarray(full), atol=1e-5
        )

    def test_skip_ego_wrong_when_slot0_not_identity(self):
        """Guards the V2VNet rolled-affine call sites: when slot 0 is NOT
        the identity, skipping it changes the result."""
        import jax.numpy as jnp

        from heal_tpu.ops.warp import warp_agents_to_ego

        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(0, 1, (1, 2, 16, 24, 4)), jnp.float32)
        aff = np.tile(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32),
                      (1, 2, 2, 1, 1))
        c, s = np.cos(0.5), np.sin(0.5)
        aff[0, 0, 0] = [[c, -s, 0.0], [s, c, 0.0]]  # non-identity slot 0
        aff = jnp.asarray(aff)
        skip = warp_agents_to_ego(feats, aff, skip_ego=True, method="exact")
        full = warp_agents_to_ego(feats, aff, skip_ego=False, method="exact")
        assert np.abs(np.asarray(skip) - np.asarray(full)).max() > 0.1


class TestShearWarp:
    """affine_warp_shear vs the exact gather warp.

    The shear path embeds the source into a rotation canvas and now
    applies the decomposed 90-deg flips/rot on the SMALL source before
    embedding (the embed is center-symmetric, so both orders agree) —
    this pins that equivalence across all four 90-deg sectors.
    """

    def _M(self, theta, h, w, tx=0.12, ty=-0.07):
        import numpy as np

        c, s = np.cos(theta), np.sin(theta)
        return np.asarray(
            [[c, -s * h / w, tx], [s * w / h, c, ty]], np.float32
        )

    def test_interior_matches_exact_on_smooth_image(self):
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.ops.warp import affine_warp, affine_warp_shear

        h, w = 64, 96
        yy, xx = np.meshgrid(
            np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
        )
        src = jnp.asarray(
            np.stack(
                [np.sin(4 * xx + 2 * yy), np.cos(3 * yy - 5 * xx)], -1
            ).astype(np.float32)
        )
        # one angle per 90-deg sector (exercises all flip/rot branches)
        for theta in (0.3, np.pi / 2 + 0.2, np.pi + 0.35, -np.pi / 2 - 0.1):
            M = jnp.asarray(self._M(theta, h, w))
            a = np.asarray(affine_warp_shear(src, M))
            b = np.asarray(affine_warp(src, M))
            d = np.abs(a - b)[6:-6, 6:-6]
            assert np.isfinite(a).all()
            # separable-interpolation-order agreement in the interior
            assert d.mean() < 2e-2 and d.max() < 0.5, (theta, d.max())

    def test_exact_at_axis_rotations(self):
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.ops.warp import affine_warp, affine_warp_shear

        h, w = 32, 48
        src = jnp.asarray(
            np.random.default_rng(3).normal(size=(h, w, 2)).astype(np.float32)
        )
        for k in range(4):
            M = jnp.asarray(self._M(k * np.pi / 2, h, w, 0.0, 0.0))
            a = np.asarray(affine_warp_shear(src, M))
            b = np.asarray(affine_warp(src, M))
            np.testing.assert_allclose(a, b, atol=2e-4)


class TestShiftRowsMatmul:
    def test_matches_dynamic_slice_fallback(self):
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.ops.warp import _shift_rows, _shift_rows_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (12, 16, 3)).astype(np.float32))
        shifts = jnp.asarray(
            rng.uniform(-5, 5, (12,)).astype(np.float32)
        )
        want = np.asarray(_shift_rows(x, shifts, max_shift=8))
        got = np.asarray(_shift_rows_matmul(x, shifts))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_integer_shift_is_exact_roll_with_zero_fill(self):
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.ops.warp import _shift_rows_matmul

        x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 12, 1))
        out = np.asarray(_shift_rows_matmul(x, jnp.asarray([2.0, -3.0])))
        np.testing.assert_allclose(out[0, :10, 0], np.arange(2, 12))
        np.testing.assert_allclose(out[0, 10:, 0], 0.0)
        np.testing.assert_allclose(out[1, 3:, 0], np.arange(12, 21))
        np.testing.assert_allclose(out[1, :3, 0], 0.0)
