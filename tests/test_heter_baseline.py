"""Heterogeneous baseline (swappable fusion) model family."""
import os

import numpy as np
import pytest

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestHeterBaseline:
    @pytest.mark.slow
    def test_m1m2_baseline_train_step(self):
        import jax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["args"]["num_agents"] = 2
        args = dict(cfg["model"]["args"])
        args.pop("fusion_backbone")
        args.pop("supervise_single", None)
        args["fusion_method"] = "att"
        args["in_head"] = 32
        args["shrink_header"] = {
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [32], "input_dim": 32,
        }
        cfg["model"] = {"core_method": "heter_model_baseline", "args": args}
        cfg["loss"] = {
            "core_method": "point_pillar_loss",
            "args": {
                "pos_cls_weight": 2.0,
                "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                "reg": {"sigma": 3.0, "weight": 2.0},
                "depth": {"weight": 1.0},
            },
        }
        ds = build_dataset(cfg, train=True)
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(model=model, criterion=criterion, tx=tx).compile()
        batch = to_device(next(ds.batches(1)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["total_loss"]))
        assert "depth_loss" in aux  # camera branch supervised through KD..
        out = trainer.eval_step(state, batch)
        assert np.isfinite(float(out["total_loss"]))


class TestHeterBaselineMS:
    def test_m1m2_multiscale_forward(self):
        import jax
        import jax.numpy as jnp

        from heal_tpu.data import build_dataset
        from heal_tpu.data.scene import collate
        from heal_tpu.models import build_model

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["args"]["num_agents"] = 2
        args = dict(cfg["model"]["args"])
        args["fusion_method"] = "max"
        args["supervise_single"] = True
        args["fusion_backbone"] = {
            "layer_nums": [1, 1],
            "layer_strides": [1, 2],
            "num_filters": [32, 64],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
        }
        args["shrink_header"] = {
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [64], "input_dim": 64,
        }
        cfg["model"] = {
            "core_method": "heter_model_baseline_ms", "args": args
        }
        ds = build_dataset(cfg, train=True)
        model = build_model(cfg["model"])
        batch = jax.tree.map(jnp.asarray, collate([ds[0]]))
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert np.isfinite(np.asarray(out["cls_preds"])).all()
        assert "cls_preds_single" in out


class TestCenterPointVariants:
    def _cfg(self, core):
        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["model"]["core_method"] = core
        cfg["loss"] = {
            "core_method": "center_point_loss",
            "args": {"cls_weight": 1.0, "reg_weight": 2.0},
        }
        return cfg

    def test_center_point_where2comm(self):
        import jax
        import jax.numpy as jnp

        from heal_tpu.data import build_dataset
        from heal_tpu.models import build_model

        cfg = self._cfg("center_point_where2comm")
        cfg["model"]["args"]["where2comm"] = {"threshold": 0.1}
        ds = build_dataset(cfg, train=False)
        batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
        model = build_model(cfg["model"])
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert "comm_rate" in out
        assert 0.0 <= float(out["comm_rate"]) <= 1.0
        assert np.isfinite(np.asarray(out["cls_preds"])).all()

    def test_center_point_multiscale(self):
        import jax
        import jax.numpy as jnp

        from heal_tpu.data import build_dataset
        from heal_tpu.models import build_model

        cfg = self._cfg("center_point_baseline_multiscale")
        cfg["model"]["args"]["shrink_header"]["input_dim"] = 64
        ds = build_dataset(cfg, train=False)
        batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
        model = build_model(cfg["model"])
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert np.isfinite(np.asarray(out["cls_preds"])).all()
        assert out["cls_preds"].shape[-1] == 1  # anchor-free heatmap


class TestAlignerBackends:
    @pytest.mark.slow
    def test_all_backends_shape_and_grad(self):
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.aligner import AlignNet

        x = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (2, 16, 16, 64)),
            jnp.float32,
        )
        for m in (
            "identity", "res1x1", "res3x3", "convnext",
            "scaligner", "sdta", "cbam", "fanet",
        ):
            net = AlignNet(
                args={
                    "core_method": m,
                    "args": {"num_of_blocks": 2, "num_of_layers": 2,
                             "dim": 64},
                }
            )
            v = net.init(jax.random.PRNGKey(0), x, False)
            y = net.apply(v, x, False)
            assert y.shape == x.shape, m
            assert np.isfinite(np.asarray(y)).all(), m
            if m == "identity":
                continue
            # trainable: gradient w.r.t. params is finite and non-trivial
            def loss(params):
                return (net.apply(dict(v, params=params), x, False) ** 2).mean()

            g = jax.grad(loss)(v["params"])
            leaves = jax.tree.leaves(g)
            assert leaves and all(
                np.isfinite(np.asarray(l)).all() for l in leaves
            ), m


class TestWhere2commFidelity:
    """Reference where2comm_attn.py agg_operator family + multi_scale."""

    def _cfg(self, agg_mode, multi_scale, with_spe=False):
        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["model"]["core_method"] = "center_point_where2comm"
        cfg["loss"] = {
            "core_method": "center_point_loss",
            "args": {"cls_weight": 1.0, "reg_weight": 2.0},
        }
        cfg["model"]["args"]["where2comm"] = {
            "threshold": 0.1,
            "multi_scale": multi_scale,
            "agg_operator": {
                "mode": agg_mode,
                "n_head": 4,
                "with_spe": with_spe,
            },
        }
        return cfg

    @pytest.mark.parametrize(
        "agg_mode,multi_scale,with_spe",
        [
            ("max", True, False),
            ("atten", True, False),
            ("transformer", True, True),
            ("atten", False, False),
            ("transformer", False, True),
        ],
    )
    def test_agg_modes_forward(self, agg_mode, multi_scale, with_spe):
        import jax
        import jax.numpy as jnp

        from heal_tpu.data import build_dataset
        from heal_tpu.models import build_model

        cfg = self._cfg(agg_mode, multi_scale, with_spe)
        ds = build_dataset(cfg, train=False)
        batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
        model = build_model(cfg["model"])
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert "comm_rate" in out
        assert 0.0 <= float(out["comm_rate"]) <= 1.0
        assert np.isfinite(np.asarray(out["cls_preds"])).all()
        assert np.isfinite(np.asarray(out["reg_preds"])).all()
