"""End-to-end integration: synthetic data -> model -> loss -> optimizer."""
import os

import numpy as np
import pytest

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def make_trainer(cfg, bf16: bool = False):
    import jax

    from heal_tpu.data import build_dataset
    from heal_tpu.losses import build_loss
    from heal_tpu.models import build_model
    from heal_tpu.parallel import Trainer
    from heal_tpu.parallel.schedulers import build_optimizer
    from heal_tpu.parallel.trainer import to_device

    ds = build_dataset(cfg, train=True)
    model = build_model(cfg["model"])
    criterion = build_loss(cfg["loss"])
    tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
    trainer = Trainer(
        model=model,
        criterion=criterion,
        tx=tx,
        supervise_single=cfg["model"]["args"].get("supervise_single", False),
        bf16=bf16,
    ).compile()
    batch = to_device(next(ds.batches(cfg["train_params"]["batch_size"])))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, batch, ds


class TestIntermediateBaseline:
    @pytest.mark.slow
    def test_overfit_one_batch(self):
        from heal_tpu.config import load_yaml

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        trainer, state, batch, _ = make_trainer(cfg)
        losses = []
        for _ in range(12):
            state, aux = trainer.train_step(state, batch)
            losses.append(float(aux["total_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, losses


class TestBf16Training:
    """Mixed-precision training policy (VERDICT r4 item 4; torch-AMP
    equivalent of ref tools/train_ddp.py:124-175)."""

    @pytest.mark.slow
    def test_bf16_overfits_and_keeps_f32_master_state(self):
        import jax.numpy as jnp

        from heal_tpu.config import load_yaml

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        trainer, state, batch, _ = make_trainer(cfg, bf16=True)
        losses = []
        for _ in range(12):
            state, aux = trainer.train_step(state, batch)
            losses.append(float(aux["total_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, losses
        # master weights and running stats stay f32
        import jax

        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype != jnp.bfloat16, "bf16 leaked into master params"
        for leaf in jax.tree.leaves(state.batch_stats):
            assert leaf.dtype != jnp.bfloat16, "bf16 leaked into batch_stats"

    @pytest.mark.slow
    def test_bf16_first_step_tracks_f32(self):
        """One bf16 step from the same init stays close to the f32 step
        (same data, same rng) — the policy is a precision change, not a
        semantic one."""
        from heal_tpu.config import load_yaml

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        tr32, st32, batch, _ = make_trainer(cfg, bf16=False)
        tr16, st16, _, _ = make_trainer(cfg, bf16=True)
        _, aux32 = tr32.train_step(st32, batch)
        _, aux16 = tr16.train_step(st16, batch)
        l32, l16 = float(aux32["total_loss"]), float(aux16["total_loss"])
        assert abs(l32 - l16) < 0.05 * max(abs(l32), 1.0), (l32, l16)


class TestHeterCollab:
    @pytest.mark.slow
    def test_forward_and_step(self):
        from heal_tpu.config import load_yaml

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        trainer, state, batch, ds = make_trainer(cfg)
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["total_loss"]))
        assert "total_loss_single" in aux
        state, aux2 = trainer.train_step(state, batch)
        assert float(aux2["total_loss"]) < float(aux["total_loss"]) * 1.5

    def test_sample_shapes(self):
        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        ds = build_dataset(cfg, train=True)
        sample = ds[0]
        L = cfg["train_params"]["max_cav"]
        assert sample["agent_mask"].shape == (L,)
        assert sample["pairwise_affine"].shape == (L, L, 2, 3)
        assert sample["pos_equal_one_single"].shape[0] == L
        batch = next(ds.batches(2))
        assert batch["inputs_m1"]["points"].shape[0] == 2
        assert batch["slots_m1"].shape == (2, L)
        # every valid agent appears exactly once in the packing
        for bi in range(2):
            packed = set(batch["slots_m1"][bi][batch["slots_m1"][bi] < L])
            valid = set(np.where(batch["agent_mask"][bi])[0])
            assert packed == valid


class TestDeviceBatchCache:
    @pytest.mark.slow
    def test_cached_epochs_match_streaming_semantics(self, tmp_path):
        """train_params.cache_device_batches trains to the same kind of
        convergence as the streaming path and leaves a resumable run dir
        (the cache only changes WHERE batches live, not the math)."""
        from heal_tpu.config import load_yaml
        from heal_tpu.config.loader import save_yaml
        from heal_tpu.tools.checkpoint import find_checkpoint
        from heal_tpu.tools.train import main as train_main

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["train_params"]["cache_device_batches"] = True
        cfg_path = str(tmp_path / "cfg.yaml")
        save_yaml(cfg, cfg_path)
        run_dir = str(tmp_path / "run")
        train_main(
            ["-y", cfg_path, "--model_dir", run_dir, "--epochs", "2",
             "--no_final_inference"]
        )
        # a bestval checkpoint exists (find_checkpoint prefers it, the
        # reference's resume semantics) and the last epoch ckpt was saved
        ep, path = find_checkpoint(run_dir)
        assert path is not None
        assert os.path.exists(os.path.join(run_dir, "net_epoch2.ckpt"))
        with open(os.path.join(run_dir, "train_log.jsonl")) as f:
            log = f.readlines()
        assert len(log) >= 2  # one JSONL row per epoch ran


class TestTrainerRngPlumbing:
    def test_comm_mask_varies_across_real_train_steps(self):
        """The Trainer passes per-step rngs into model.apply, so the
        Where2comm train-time threshold sampling (CommMask, fuse/
        where2comm_comm.py) is live in REAL training — the reference
        always trains against its comm masking
        (comm_modules/where2comm.py:34-79). With lr=0 and an identical
        batch every step, the rng is the ONLY source of variation in the
        reported comm_rate."""
        from heal_tpu.config import load_yaml

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["model"]["args"]["fusion_method"] = "where2comm"
        cfg["model"]["args"]["where2comm"] = {
            "threshold": 0.03, "in_channels": 64,
        }
        cfg["optimizer"]["lr"] = 0.0
        trainer, state, batch, _ = make_trainer(cfg)
        rates = []
        for _ in range(6):
            state, aux = trainer.train_step(state, batch)
            assert "comm_rate" in aux
            rates.append(round(float(aux["comm_rate"]), 6))
        assert len(set(rates)) > 1, rates


class TestPerModelBNMomentum:
    def test_momentum_rides_norm_kind_string(self):
        """bn_momentum is per-model (encoded as norm="batch@M" by
        build_model), not a process global: two models built in one
        process (the KD teacher+student case) keep their own values."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.layers import Norm, parse_norm
        from heal_tpu.models.registry import build_model

        assert parse_norm("batch@0.99") == ("batch", 0.99)
        assert parse_norm("batch") == ("batch", None)

        x = jnp.ones((2, 4, 4, 3)) * 2.0
        outs = {}
        for mom in (0.5, 0.99):
            norm = Norm(kind=f"batch@{mom}")
            v = norm.init(jax.random.PRNGKey(0), x, train=True)
            _, mut = norm.apply(
                v, x, train=True, mutable=["batch_stats"]
            )
            outs[mom] = float(mut["batch_stats"]["mean"][0])
        # running mean after one step: (1 - mom) * batch_mean
        assert abs(outs[0.5] - 0.5 * 2.0) < 1e-6
        assert abs(outs[0.99] - 0.01 * 2.0) < 1e-6

        # build_model rewrites args['norm'] per instance, no global
        args = {
            "voxel_size": [0.4, 0.4, 4],
            "lidar_range": [-38.4, -38.4, -3, 38.4, 38.4, 1],
            "anchor_number": 2,
            "bn_momentum": 0.99,
            "pillar_vfe": {"num_filters": [32]},
            "point_pillar_scatter": {"num_features": 32},
            "base_bev_backbone": {
                "resnet": True, "layer_nums": [1], "layer_strides": [2],
                "num_filters": [32], "upsample_strides": [1],
                "num_upsample_filter": [32],
            },
        }
        m_ref = build_model({"core_method": "point_pillar", "args": args})
        m_def = build_model(
            {"core_method": "point_pillar",
             "args": {k: v for k, v in args.items() if k != "bn_momentum"}}
        )
        assert m_ref.args["norm"] == "batch@0.99"
        assert m_def.args.get("norm", "batch") == "batch"
