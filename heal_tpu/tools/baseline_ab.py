"""Baseline-provenance A/B: params + FLOPs of the flagship model, ours
vs the PyTorch reference, at the benchmark scale.

Reference protocol: tools/profiler/params_calc.py:28-60 (fvcore FLOPs +
param count on one sample). Here the reference model is imported from
/root/reference via the parity shim and instrumented with forward hooks
(conv/linear MACs); our model is measured with XLA's compiled
cost_analysis. Both run ONE frame at bench scale: 5 m1 agents,
204.8 m x 102.4 m range, 0.4 m voxels (512 x 256 BEV), pillar capacity
from the bench config.

    python -m heal_tpu.tools.baseline_ab [--pillars 15000]

Writes a markdown table to stdout for BASELINE.md.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_flops_params(num_pillars: int, num_agents: int):
    """Build the reference HeterPyramidCollab (m1) and count params +
    conv/linear MACs on one bench-scale frame."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_shim import load_reference

    load_reference()
    import torch
    from opencood.models.heter_pyramid_collab import HeterPyramidCollab

    from heal_tpu.configs.generate import CAV_RANGE, heal_model

    args = heal_model(["m1"])["args"]
    args["lidar_range"] = CAV_RANGE
    model = HeterPyramidCollab(args).eval()
    params = sum(p.numel() for p in model.parameters())

    macs = [0]

    def hook(mod, inp, out):
        if isinstance(mod, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            fan = (
                mod.in_channels
                // mod.groups
                * mod.kernel_size[0]
                * mod.kernel_size[1]
            )
            macs[0] += out.numel() * fan
        elif isinstance(mod, torch.nn.Linear):
            macs[0] += out.numel() * mod.in_features
        elif isinstance(mod, torch.nn.Conv1d):
            fan = mod.in_channels // mod.groups * mod.kernel_size[0]
            macs[0] += out.numel() * fan

    for mod in model.modules():
        mod.register_forward_hook(hook)

    n = num_pillars * num_agents
    vox = torch.randn(n, 32, 4)
    # coords: (batch-agent idx, z, y, x) within the 256 x 512 grid
    coords = torch.stack(
        [
            torch.arange(n) % num_agents,
            torch.zeros(n, dtype=torch.long),
            torch.randint(0, 256, (n,)),
            torch.randint(0, 512, (n,)),
        ],
        dim=1,
    )
    data = {
        "inputs_m1": {
            "voxel_features": vox,
            "voxel_coords": coords,
            "voxel_num_points": torch.full((n,), 32, dtype=torch.long),
        },
        "agent_modality_list": ["m1"] * num_agents,
        "record_len": torch.tensor([num_agents]),
        "pairwise_t_matrix": torch.eye(4)[None, None, None].repeat(
            1, num_agents, num_agents, 1, 1
        ),
    }
    with torch.no_grad():
        model(data)
    return params, 2 * macs[0]  # FLOPs = 2 * MACs


def ours_flops_params(num_agents: int):
    """Our flagship model at the same scale: param count + XLA-compiled
    FLOP estimate of the full jitted forward (voxelize -> heads)."""
    import jax
    import jax.numpy as jnp

    from heal_tpu.config import load_yaml
    from heal_tpu.data import build_dataset
    from heal_tpu.models import build_model

    cfg = load_yaml(
        os.path.join(REPO, "heal_tpu", "configs", "opv2v_m1_pyramid.yaml")
    )
    cfg["fusion"]["args"]["num_scenes_test"] = 1
    ds = build_dataset(cfg, train=False)
    model = build_model(cfg["model"])
    batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
    )
    def _arrays_only(out):
        return {
            k: x for k, x in out.items() if not isinstance(x, (str, bytes))
        }

    fwd = jax.jit(lambda v, b: _arrays_only(model.apply(v, b, train=False)))
    lowered = fwd.lower(variables, batch)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    return params, flops


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu baseline_ab")
    p.add_argument("--pillars", type=int, default=15000,
                   help="non-empty pillars per agent fed to the reference "
                        "(ours voxelizes its own 30k-point frames)")
    p.add_argument("--agents", type=int, default=5)
    a = p.parse_args(argv)

    ours_p, ours_f = ours_flops_params(a.agents)
    print(f"ours:      params {ours_p/1e6:.2f} M  "
          f"fwd FLOPs {ours_f/1e9:.1f} G (XLA cost_analysis, full "
          f"pipeline incl. voxelize/decode)")
    ref_p, ref_f = reference_flops_params(a.pillars, a.agents)
    print(f"reference: params {ref_p/1e6:.2f} M  "
          f"fwd FLOPs {ref_f/1e9:.1f} G (conv/linear hooks, "
          f"{a.pillars} pillars/agent)")
    print()
    print("| side | params (M) | forward FLOPs (G/frame) | method |")
    print("|---|---|---|---|")
    print(f"| reference (torch CPU) | {ref_p/1e6:.2f} | {ref_f/1e9:.1f} | "
          f"conv/linear MAC hooks, {a.agents} agents x {a.pillars} pillars |")
    print(f"| heal_tpu | {ours_p/1e6:.2f} | {ours_f/1e9:.1f} | "
          f"XLA cost_analysis, full jitted pipeline |")


if __name__ == "__main__":
    main()
