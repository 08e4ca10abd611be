"""Every fusion method: shapes, masking invariance, ego-frame semantics."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, l, h, w, c = 1, 3, 16, 16, 32
    feats = jnp.asarray(rng.normal(0, 1, (b, l, h, w, c)).astype(np.float32))
    ident = np.tile(
        np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (b, l, l, 1, 1)
    )
    affine = jnp.asarray(ident)
    mask = jnp.asarray(np.array([[True, True, False]]))
    return feats, affine, mask


def _run(module, feats, affine, mask):
    import jax

    v = module.init(jax.random.PRNGKey(0), feats, affine, mask)
    return module, v, np.asarray(module.apply(v, feats, affine, mask))


ALL_METHODS = [
    ("max", {}),
    ("att", {}),
    ("disconet", {"in_channels": 32}),
    ("v2vnet", {"in_channels": 32, "num_iteration": 1, "agg_operator": "avg",
                "gru_flag": True}),
    ("where2comm", {"in_channels": 32}),
    ("who2com", {"in_channels": 32}),
    ("v2xvit", {"depth": 1}),
    ("cobevt", {"input_dim": 32, "window_size": 4, "depth": 1}),
]


class TestFusionZoo:
    @pytest.mark.parametrize("method,args", ALL_METHODS)
    def test_shape_and_padding_invariance(self, setup, method, args):
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.fuse import build_fusion

        feats, affine, mask = setup
        module = build_fusion(method, args)
        module, v, out = _run(module, feats, affine, mask)
        assert out.shape == (1, 16, 16, 32)
        assert np.isfinite(out).all()

        # corrupt the masked (padded) agent -> output must not change
        corrupted = np.asarray(feats).copy()
        corrupted[:, 2] = 77.0
        out2 = np.asarray(module.apply(v, jnp.asarray(corrupted), affine, mask))
        np.testing.assert_allclose(out, out2, atol=2e-4)

    def test_max_fusion_is_elementwise_max(self, setup):
        import jax

        from heal_tpu.models.fuse import MaxFusion

        feats, affine, mask = setup
        module = MaxFusion()
        v = module.init(jax.random.PRNGKey(0), feats, affine, mask)
        out = np.asarray(module.apply(v, feats, affine, mask))
        want = np.maximum(np.asarray(feats)[0, 0], np.asarray(feats)[0, 1])
        np.testing.assert_allclose(out[0], want, atol=1e-6)

    def test_single_agent_reduces_to_identityish(self, setup):
        """With only the ego valid, max fusion returns the ego feature."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.fuse import MaxFusion

        feats, affine, _ = setup
        solo = jnp.asarray(np.array([[True, False, False]]))
        module = MaxFusion()
        v = module.init(jax.random.PRNGKey(0), feats, affine, solo)
        out = np.asarray(module.apply(v, feats, affine, solo))
        np.testing.assert_allclose(out[0], np.asarray(feats)[0, 0], atol=1e-6)
