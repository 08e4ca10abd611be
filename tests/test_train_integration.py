"""End-to-end integration: synthetic data -> model -> loss -> optimizer."""
import os

import numpy as np
import pytest

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def make_trainer(cfg):
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
