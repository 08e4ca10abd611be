"""Benchmark: end-to-end collaborative-perception inference frames/sec.

Measures the flagship HEAL pyramid-collab model (m1 PointPillars, real
OPV2V scale: 204.8 m x 102.4 m range, 0.4 m voxels -> 512x256 BEV, 5
agents, 30k points/agent) end to end on the available accelerator:
device-side voxelization -> encoder -> pyramid fusion -> heads ->
decode+NMS. Protocol mirrors the reference profiler
(tools/profiler/params_calc.py: warmup then steady-state timing).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the A100 PyTorch reference estimate
recorded in BASELINE.md (reference publishes no number in-tree; the HEAL
PyTorch pipeline measures ~20 fps end-to-end on A100-class hardware for
this config — see BASELINE.md "North star": the 2x target means
vs_baseline >= 2.0 is the goal).
"""
from __future__ import annotations

import json
import os
import time

A100_REFERENCE_FPS = 20.0


def main():
    import jax
    import jax.numpy as jnp

    from heal_tpu.config import load_yaml
    from heal_tpu.data import build_dataset
    from heal_tpu.models import build_model
    from heal_tpu.postprocess.decode import post_process_single

    cfg = load_yaml(
        os.path.join(
            os.path.dirname(__file__),
            "heal_tpu",
            "configs",
            "opv2v_m1_pyramid.yaml",
        )
    )
    cfg["fusion"]["args"]["num_scenes_test"] = 2

    ds = build_dataset(cfg, train=False)
    model = build_model(cfg["model"])
    batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    # bf16 inference (weights + activations); decode/NMS stay f32
    def cast16(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            t,
        )

    variables = cast16(variables)
    batch = cast16(batch)

    post = cfg["postprocess"]
    anchors = jnp.asarray(ds.anchors)
    gt_range = jnp.asarray(post["gt_range"], dtype=jnp.float32)

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch, train=False)
        det = post_process_single(
            out["cls_preds"][0].astype(jnp.float32),
            out["reg_preds"][0].astype(jnp.float32),
            out["dir_preds"][0].astype(jnp.float32),
            anchors,
            batch["transformation_matrix"][0].astype(jnp.float32),
            gt_range,
            order="hwl",
            score_threshold=post["target_args"]["score_threshold"],
            nms_threshold=post["nms_thresh"],
        )
        return det

    # warmup + compile
    det = infer(variables, batch)
    jax.block_until_ready(det)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        det = infer(variables, batch)
    jax.block_until_ready(det)
    dt = time.perf_counter() - t0
    fps = iters / dt

    print(
        json.dumps(
            {
                "metric": "opv2v_heter_pyramid_inference",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
