"""Secondary performance matrix: per-path inference + train throughput.

Complements the headline `bench.py` (HEAL pyramid collab) with the other
encoder families and a training-throughput number — the counterpart of
the reference profiler suite (tools/profiler/params_calc.py per-model
fps, traintp_calc.py samples/s). Results land in BASELINE.md tables.

Usage:
    python -m heal_tpu.tools.bench_matrix [--paths pp_max,second,lss]
                                          [--frames 8] [--out matrix.json]

Methodology matches bench.py: a lax.scan over distinct frames inside one
dispatched computation (device-event analogue; per-dispatch RPC on this
dev machine would otherwise dominate).
"""
from __future__ import annotations

import argparse
import json
import time

PATH_CONFIGS = {
    # PointPillars + max fusion, real OPV2V scale
    "pp_max": {
        "cfg": "opv2v/lidar_only/max.yaml",
        "desc": "PointPillars intermediate max-fusion",
    },
    # SECOND sparse-conv encoder (HEAL stage-2 m3 single-agent config)
    "second": {
        "cfg": "opv2v/heal/stage2/m3_alignto_m1.yaml",
        "desc": "SECOND sparse 3D conv (heter single m3)",
    },
    # camera-only LSS pyramid collab
    "lss": {
        "cfg": "opv2v/camera_only/m2_pyramid.yaml",
        "desc": "Lift-Splat-Shoot camera pyramid collab",
    },
    # full heterogeneous alliance: all four encoder families in one frame.
    # Serving capacity: 2 agents per modality (heter.modality_setting
    # max_agents) — without caps every modality pads to max_cav and the
    # model encodes 4 x max_cav mostly-empty agent slots.
    "heter4": {
        "cfg": "opv2v/heal/final_infer/m1m2m3m4.yaml",
        "desc": "HEAL alliance m1+m2+m3+m4 (pillars/camera/SECOND/16-line)",
        "max_agents": 2,
    },
}


def bench_path(name: str, spec: dict, frames: int):
    import os

    import jax
    import jax.numpy as jnp

    from ..config import load_yaml
    from ..data import build_dataset
    from ..models import build_model
    from ..postprocess.decode import post_process_single
    from ..utils.jit_cache import enable_persistent_cache, jit_init

    enable_persistent_cache()

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_yaml(os.path.join(root, spec["cfg"]))
    # perf protocol runs on the synthetic backend (same shapes/ranges as
    # the real tree, which is not mounted on the bench machine)
    cfg["fusion"]["dataset"] = "synthetic"
    cfg["fusion"]["args"] = dict(
        cfg["fusion"].get("args") or {}, num_scenes_test=frames
    )
    if "max_agents" in spec and "heter" in cfg:
        for setting in cfg["heter"]["modality_setting"].values():
            setting["max_agents"] = spec["max_agents"]
    ds = build_dataset(cfg, train=False)
    model = build_model(cfg["model"])

    def cast16(t):
        def leaf(path, x):
            if any(getattr(p, "key", None) == "points" for p in path):
                return x
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(jnp.bfloat16)
            return x

        return jax.tree_util.tree_map_with_path(leaf, t)

    fs = [
        cast16(jax.tree.map(jnp.asarray, b))
        for _, b in zip(range(frames), ds.batches(1, shuffle=False))
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *fs)
    variables = cast16(jit_init(model, jax.random.PRNGKey(0), fs[0], train=False))
    post = cfg["postprocess"]
    anchors = jnp.asarray(ds.anchors)
    gt_range = jnp.asarray(post["gt_range"], dtype=jnp.float32)

    def infer_one(b):
        out = model.apply(variables, b, train=False)
        return post_process_single(
            out["cls_preds"][0].astype(jnp.float32),
            out["reg_preds"][0].astype(jnp.float32),
            out["dir_preds"][0].astype(jnp.float32)
            if "dir_preds" in out and out["dir_preds"] is not None
            else None,
            anchors,
            b["transformation_matrix"][0].astype(jnp.float32),
            gt_range,
            order=post["order"],
            score_threshold=post["target_args"]["score_threshold"],
            nms_threshold=post["nms_thresh"],
            anchor_free=bool(out.get("anchor_free", False)),
        )

    @jax.jit
    def serve(stacked):
        def step(_, b):
            return (), infer_one(b)

        _, dets = jax.lax.scan(step, (), stacked)
        return dets

    dets = serve(stacked)
    jax.block_until_ready(dets)
    reps = 4
    fps = 0.0
    for _ in range(3):  # best of 3 passes (transient tunnel-load dips)
        t0 = time.perf_counter()
        for _ in range(reps):
            dets = serve(stacked)
        jax.block_until_ready(dets)
        fps = max(fps, reps * frames / (time.perf_counter() - t0))
    return {"path": name, "desc": spec["desc"], "fps": round(fps, 2)}


def bench_train_throughput(frames: int = 8, steps: int = 10,
                           bf16: bool = False):
    """Train-step throughput on the demo config (ref traintp_calc.py).

    ``bf16``: the Trainer's mixed-precision policy (f32 master weights,
    bf16 compute — the torch-AMP --half equivalent)."""
    import os

    import jax
    import optax

    from ..config import load_yaml
    from ..data import build_dataset
    from ..losses import build_loss
    from ..models import build_model
    from ..parallel import Trainer
    from ..parallel.trainer import to_device

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_yaml(os.path.join(root, "opv2v/lidar_only/max.yaml"))
    cfg["fusion"]["dataset"] = "synthetic"
    cfg["fusion"]["args"] = dict(
        cfg["fusion"].get("args") or {}, num_scenes_train=frames
    )
    ds = build_dataset(cfg, train=True)
    model = build_model(cfg["model"])
    criterion = build_loss(cfg["loss"])
    trainer = Trainer(model=model, criterion=criterion,
                      tx=optax.adam(1e-3), bf16=bf16).compile()
    bs = 2
    batch = to_device(next(ds.batches(bs, shuffle=False)))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, batch)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = trainer.train_step(state, batch)
    jax.block_until_ready(aux["total_loss"])
    sps = steps * bs / (time.perf_counter() - t0)
    name = "train_pp_max_bf16" if bf16 else "train_pp_max"
    desc = ("train step samples/s (b2, bf16 policy)" if bf16
            else "train step samples/s (b2)")
    return {"path": name, "desc": desc, "fps": round(sps, 2)}


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu bench_matrix")
    p.add_argument(
        "--paths", default="pp_max,second,lss,heter4,train,train_bf16"
    )
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    rows = []
    for name in args.paths.split(","):
        name = name.strip()
        if name == "train":
            rows.append(bench_train_throughput(args.frames))
        elif name == "train_bf16":
            rows.append(bench_train_throughput(args.frames, bf16=True))
        else:
            rows.append(bench_path(name, PATH_CONFIGS[name], args.frames))
        print(json.dumps(rows[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
