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
    ("when2com", {"in_channels": 32, "policy_width": 32, "mode": "activated"}),
    ("transformer", {"in_channels": 32, "n_head": 4}),
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


class TestWhere2commMasks:
    """Comm masks gate transmissions and report comm_rate
    (ref comm_modules/where2comm.py:34-79)."""

    def _fusion(self, threshold):
        from heal_tpu.models.fuse import build_fusion

        return build_fusion(
            "where2comm", {"in_channels": 32, "threshold": threshold}
        )

    def test_comm_rate_decreases_with_threshold(self, setup):
        import jax

        feats, affine, mask = setup
        conf = jax.nn.sigmoid(feats[..., :1])  # (B, L, H, W, 1) in (0,1)
        rates = []
        for thr in (0.0, 0.5, 0.9, 1.1):
            mod = self._fusion(thr)
            v = mod.init(
                jax.random.PRNGKey(0), feats, affine, mask, False, conf
            )
            out, rate = mod.apply(
                v, feats, affine, mask, False, confidence=conf
            )
            assert np.isfinite(np.asarray(out)).all()
            rates.append(float(rate))
        assert rates[0] == 1.0  # everything clears threshold 0
        assert rates[-1] == 0.0  # nothing clears threshold > 1
        assert all(a >= b for a, b in zip(rates, rates[1:])), rates

    def test_full_mask_equals_ego_only(self, setup):
        """threshold > 1 suppresses every non-ego transmission: the fused
        output must equal fusing with all collaborators zeroed."""
        import jax
        import jax.numpy as jnp

        feats, affine, mask = setup
        conf = jax.nn.sigmoid(feats[..., :1])
        mod = self._fusion(1.1)
        v = mod.init(jax.random.PRNGKey(0), feats, affine, mask, False, conf)
        out_masked, rate = mod.apply(
            v, feats, affine, mask, False, confidence=conf
        )
        ego_only = jnp.zeros_like(feats).at[:, 0].set(feats[:, 0])
        out_ego, _ = mod.apply(
            v, ego_only, affine, mask, False,
            confidence=jnp.zeros_like(conf),
        )
        np.testing.assert_allclose(
            np.asarray(out_masked), np.asarray(out_ego), atol=1e-5
        )

    def test_train_mode_masks_like_eval(self, setup):
        """The reference trains with masking always applied
        (comm_modules/where2comm.py:34-79); without a ``comm`` rng the
        train-time mask uses the fixed config threshold."""
        import jax

        feats, affine, mask = setup
        conf = jax.nn.sigmoid(feats[..., :1])
        mod = self._fusion(0.9)
        v = mod.init(jax.random.PRNGKey(0), feats, affine, mask, False, conf)
        _, rate_train = mod.apply(
            v, feats, affine, mask, True, confidence=conf
        )
        _, rate_eval = mod.apply(
            v, feats, affine, mask, False, confidence=conf
        )
        assert float(rate_train) == float(rate_eval) < 1.0

    def test_train_threshold_sampling(self, setup):
        """With a ``comm`` rng, training samples the threshold per call
        (log-uniform around the config value) so masked-robustness is
        trained behaviour across the bandwidth sweep."""
        import jax

        feats, affine, mask = setup
        conf = jax.nn.sigmoid(feats[..., :1])
        mod = self._fusion(0.6)
        v = mod.init(jax.random.PRNGKey(0), feats, affine, mask, False, conf)
        rates = set()
        for seed in range(6):
            _, rate = mod.apply(
                v, feats, affine, mask, True, confidence=conf,
                rngs={"comm": jax.random.PRNGKey(seed)},
            )
            rates.add(round(float(rate), 6))
        assert len(rates) > 1, rates

    def test_baseline_model_reports_comm_rate(self):
        """point_pillar_baseline + where2comm emits comm_rate and the
        _single head outputs used as transmission confidence."""
        import os

        import jax
        import jax.numpy as jnp

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset
        from heal_tpu.models import build_model

        cfg = load_yaml(
            os.path.join(
                os.path.dirname(__file__), "configs", "tiny_intermediate.yaml"
            )
        )
        cfg["model"]["args"]["fusion_method"] = "where2comm"
        cfg["model"]["args"]["where2comm"] = {
            "in_channels": 64, "threshold": 0.15,
        }
        cfg["model"]["args"]["supervise_single"] = True
        ds = build_dataset(cfg, train=False)
        batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
        model = build_model(cfg["model"])
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert "comm_rate" in out and 0.0 <= float(out["comm_rate"]) <= 1.0
        assert "cls_preds_single" in out


class TestV2XViTTypeEquivariance:
    """Typed HMSA: embeddings follow the agent TYPE (modality), not the
    slot (ref sub_modules/hmsa.py HGTCavAttention per-type projections +
    per-type-pair relation matrices)."""

    def _mod(self):
        from heal_tpu.models.fuse import build_fusion

        return build_fusion("v2xvit", {"depth": 1, "num_types": 3})

    def _setup4(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        b, l, h, w, c = 1, 4, 8, 8, 32
        feats = jnp.asarray(
            rng.normal(0, 1, (b, l, h, w, c)).astype(np.float32)
        )
        affine = jnp.asarray(
            np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
                    (b, l, l, 1, 1))
        )
        mask = jnp.asarray(np.ones((b, l), bool))
        types = jnp.asarray(np.array([[0, 1, 2, 1]], np.int32))
        return feats, affine, mask, types

    def test_collaborator_permutation_invariance(self):
        """Shuffling which SLOT holds which (feature, modality) pair must
        not change the ego output: nothing is keyed on slot index."""
        import jax

        feats, affine, mask, types = self._setup4()
        mod = self._mod()
        v = mod.init(
            jax.random.PRNGKey(0), feats, affine, mask, False, types
        )
        out = np.asarray(
            mod.apply(v, feats, affine, mask, False, agent_types=types)
        )
        perm = [0, 3, 1, 2]  # ego fixed, collaborators shuffled
        out_p = np.asarray(
            mod.apply(
                v, feats[:, perm], affine, mask, False,
                agent_types=types[:, perm],
            )
        )
        np.testing.assert_allclose(out, out_p, atol=2e-4)

    def test_type_swap_changes_output(self):
        """Swapping only the TYPES of two collaborators (features stay in
        their slots) must change the fusion: the per-slot-bias design this
        replaces was blind to it."""
        import jax

        feats, affine, mask, types = self._setup4()
        mod = self._mod()
        v = mod.init(
            jax.random.PRNGKey(0), feats, affine, mask, False, types
        )
        out = np.asarray(
            mod.apply(v, feats, affine, mask, False, agent_types=types)
        )
        types_swapped = types.at[0, 1].set(2).at[0, 2].set(1)
        out_s = np.asarray(
            mod.apply(
                v, feats, affine, mask, False, agent_types=types_swapped
            )
        )
        assert np.abs(out - out_s).max() > 1e-4


class TestTransformerDropout:
    """Reference fidelity: V2XViT and CoBEVT use dropout throughout
    (v2xvit_basic.py:42,95-155 dropout 0.3 in the published configs;
    swap_fusion_modules.py drop_out 0.1). Train mode must be stochastic
    per dropout rng; eval mode must be deterministic and rng-free."""

    @pytest.mark.parametrize(
        "method,args",
        [
            ("v2xvit", {"depth": 1, "dropout": 0.3}),
            ("cobevt", {"input_dim": 32, "window_size": 4, "depth": 1,
                        "drop_out": 0.3}),
        ],
    )
    def test_train_stochastic_eval_deterministic(self, setup, method, args):
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.fuse import build_fusion

        feats, affine, mask = setup
        module = build_fusion(method, args)
        v = module.init(jax.random.PRNGKey(0), feats, affine, mask)

        # eval: deterministic, no rng needed
        e1 = np.asarray(module.apply(v, feats, affine, mask, False))
        e2 = np.asarray(module.apply(v, feats, affine, mask, False))
        np.testing.assert_array_equal(e1, e2)

        # train: different dropout rngs -> different outputs
        t1 = np.asarray(module.apply(
            v, feats, affine, mask, True,
            rngs={"dropout": jax.random.PRNGKey(1)},
        ))
        t2 = np.asarray(module.apply(
            v, feats, affine, mask, True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        ))
        assert np.abs(t1 - t2).max() > 1e-4
        # same rng -> reproducible
        t1b = np.asarray(module.apply(
            v, feats, affine, mask, True,
            rngs={"dropout": jax.random.PRNGKey(1)},
        ))
        np.testing.assert_array_equal(t1, t1b)
